"""Pallas kernel tests (interpreter mode on the CPU backend; SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from sequitr_tpu.ops import normalize
from sequitr_tpu.ops.pallas import pallas_quantiles


class TestPallasHistogram:
    def test_quantiles_close_to_exact(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.gamma(2.0, 100.0, (256, 256)).astype(np.float32))
        q = pallas_quantiles(x, [0.05, 0.995], interpret=True)
        ref = np.percentile(np.asarray(x), [5.0, 99.5])
        span = float(np.asarray(x).max() - np.asarray(x).min())
        # max error ~ one bin of the range
        np.testing.assert_allclose(np.asarray(q), ref, atol=span / 1024 * 2)

    def test_padded_rows(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(100, 20, (100, 128)).astype(np.float32))
        q = pallas_quantiles(x, [0.05, 0.995], interpret=True)
        ref = np.percentile(np.asarray(x), [5.0, 99.5])
        span = float(np.asarray(x).max() - np.asarray(x).min())
        np.testing.assert_allclose(np.asarray(q), ref, atol=span / 1024 * 2)

    def test_wide_frame_column_chunking(self):
        """Frames wider than the kernel's 1024-lane chunk (e.g. 4096² —
        which OOMed scoped VMEM before chunking) and non-multiple widths
        (column padding) both stay correct."""
        rng = np.random.default_rng(3)
        for shape in ((64, 2048), (64, 1500)):
            x = jnp.asarray(rng.gamma(2.0, 50.0, shape).astype(np.float32))
            q = pallas_quantiles(x, [0.05, 0.995], interpret=True)
            ref = np.percentile(np.asarray(x), [5.0, 99.5])
            span = float(np.asarray(x).max() - np.asarray(x).min())
            np.testing.assert_allclose(np.asarray(q), ref, atol=span / 1024 * 2)

    def test_normalize_pallas_close_to_exact(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.gamma(2.0, 80.0, (128, 256)).astype(np.float32))
        out = normalize.percentile_normalize_pallas(x, interpret=True)
        exact = normalize.percentile_normalize(x)
        assert float(jnp.max(jnp.abs(out - exact))) < 5e-3

    def test_normalize_pallas_3d_volume(self):
        """(Z, H, W) volumes fold into histogram rows — same pixel multiset,
        so the result matches the exact path within one-bin tolerance."""
        import numpy as np

        from sequitr_tpu.ops import normalize

        rng = np.random.default_rng(6)
        vol = rng.gamma(2.0, 1.0, (4, 32, 64)).astype(np.float32)
        out = normalize.percentile_normalize_pallas(vol, interpret=True)
        ref = normalize.percentile_normalize(vol)
        assert out.shape == vol.shape
        assert float(np.max(np.abs(np.asarray(out) - np.asarray(ref)))) < 0.02

    def test_quantiles_non_chunk_multiple_width(self):
        """Widths in 257..1023 that are not 256-multiples (e.g. 480, 640)
        must pad to the kernel's chunk multiple, not crash (code-review
        regression: pad modulus was 1024, kernel chunk is 256)."""
        import numpy as np

        from sequitr_tpu.ops.pallas import pallas_quantiles

        for w in (480, 640, 257):
            rng = np.random.default_rng(w)
            x = rng.random((8, w)).astype(np.float32)
            q = pallas_quantiles(x, [0.05, 0.995], interpret=True)
            ref = np.quantile(x, [0.05, 0.995])
            assert np.max(np.abs(np.asarray(q) - ref)) < 0.01, w

    def test_normalize_pallas_multichannel(self):
        """channel_axis=True: per-channel percentiles, one vmapped launch —
        must match the exact per-channel path within one-bin tolerance."""
        import numpy as np

        from sequitr_tpu.ops import normalize

        rng = np.random.default_rng(11)
        # channels with wildly different scales (different fluorophores)
        x = np.stack(
            [rng.gamma(2.0, 1.0, (32, 64)), rng.gamma(2.0, 500.0, (32, 64))],
            axis=-1,
        ).astype(np.float32)
        out = normalize.percentile_normalize_pallas(
            x, interpret=True, channel_axis=True
        )
        ref = normalize.percentile_normalize(x, channel_axis=True)
        assert out.shape == x.shape
        assert float(np.max(np.abs(np.asarray(out) - np.asarray(ref)))) < 0.02
