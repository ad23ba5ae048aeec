"""Study-kernel tests (sequitr_tpu.studies — measured experiments, not prod).

Numerics validated in Pallas interpreter mode on the CPU backend.
"""

import jax.numpy as jnp
import numpy as np


class TestPallasConvKernels:
    """Experimental conv kernels — numerics validated in interpreter mode."""

    def _ref(self, x, w, b):
        import jax

        dn = jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x[None], w, (1, 1), "SAME", dimension_numbers=dn
        )[0] + b
        return jnp.maximum(y, 0)

    def test_im2col_conv_matches_lax(self):
        from sequitr_tpu.studies.pallas_conv2d import conv3x3_bias_act

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 128, 16)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 16, 8)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        out = conv3x3_bias_act(x, w, b, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._ref(x, w, b)), atol=1e-4
        )

    def test_gemm_conv_matches_lax(self):
        from sequitr_tpu.studies import pallas_conv2d_gemm as g

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(64, 64, 32)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 32, 16)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        yf = g.conv3x3_gemm(g.flatten_chw(x), w, b, 64, 64, interpret=True)
        out = g.unflatten_chw(yf, 64, 64)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._ref(x, w, b)), atol=1e-4
        )

    def test_gemm2_conv_matches_lax(self):
        from sequitr_tpu.studies import pallas_conv2d_gemm2 as g2

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(32, 120, 16)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 16, 8)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        yf = g2.conv3x3_gemm2(g2.flatten_chw2(x), w, b, 32, 120, interpret=True)
        out = g2.unflatten_chw2(yf, 32, 120)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._ref(x, w, b)), atol=1e-4
        )


class TestWinograd:
    def test_matches_direct_conv(self):
        from sequitr_tpu.studies.winograd import winograd_conv3x3
        import jax

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 8, 4)) * 0.2).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
        out = winograd_conv3x3(x, w, b)
        dn = jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn
        ) + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_differentiable(self):
        from sequitr_tpu.studies.winograd import winograd_conv3x3
        import jax

        x = jnp.ones((1, 8, 8, 2))
        w = jnp.ones((3, 3, 2, 2)) * 0.1
        g = jax.grad(lambda ww: float(0) + jnp.sum(winograd_conv3x3(x, ww) ** 2))(w)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestPTQUNet:
    """Parked int8 PTQ recipe (studies/ptq_unet.py): the full quantize ->
    calibrate -> int8 forward chain is numerically sound even though the
    measured chip gives it no speedup (studies/int8_conv.py verdict)."""

    def _model(self, seed=0):
        import jax
        from sequitr_tpu.models import unet

        cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=3, base_features=8,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(seed), cfg)
        return cfg, params, state

    def test_quantized_forward_tracks_f32(self):
        import jax
        from sequitr_tpu.models import unet
        from sequitr_tpu.studies import ptq_unet

        cfg, params, state = self._model()
        rng = np.random.default_rng(0)
        calib = [rng.random((2, 32, 32, 1)).astype(np.float32) for _ in range(3)]
        qcfg, qparams = ptq_unet.quantize(cfg, params, state, calib)
        assert qcfg.norm == "none"
        x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
        logits_q = ptq_unet.apply(qcfg, qparams, x)
        fcfg, fparams, fstate = unet.fold_batchnorm(cfg, params, state)
        logits_f, _ = unet.apply(fcfg, fparams, fstate, x, train=False)
        # int8 PTQ bar: labels nearly identical, logits close in scale
        agree = float(
            jnp.mean(
                (jnp.argmax(logits_q, -1) == jnp.argmax(logits_f, -1))
                .astype(jnp.float32)
            )
        )
        assert agree > 0.98, agree
        err = float(jnp.max(jnp.abs(logits_q - logits_f)))
        ref = float(jnp.max(jnp.abs(logits_f)))
        assert err < 0.15 * max(ref, 1.0), (err, ref)

    def test_template_matches_quantized_structure(self):
        import jax
        from sequitr_tpu.studies import ptq_unet

        cfg, params, state = self._model(1)
        rng = np.random.default_rng(1)
        qcfg, qparams = ptq_unet.quantize(
            cfg, params, state, [rng.random((1, 16, 16, 1)).astype(np.float32)]
        )
        tmpl = ptq_unet.template(qcfg)
        ts = jax.tree.structure(tmpl)
        qs = jax.tree.structure(qparams)
        assert ts == qs
        same = jax.tree.map(
            lambda a, b: (a.shape == b.shape and a.dtype == b.dtype),
            tmpl, qparams,
        )
        assert all(jax.tree.leaves(same))

    def test_calibration_requires_batches(self):
        import pytest
        from sequitr_tpu.studies import ptq_unet
        from sequitr_tpu.models import unet

        cfg, params, state = self._model(2)
        fcfg, fparams, _ = unet.fold_batchnorm(cfg, params, state)
        with pytest.raises(ValueError):
            ptq_unet.calibrate(fcfg, fparams, [])


class TestRoofline:
    def test_roofline_runs_and_accounts(self):
        """Smoke the per-level roofline study at a tiny size on CPU: every
        pipeline stage produces a row, FLOP accounting sums to the whole
        graph's, and the fused reference runs (round-4 verdict item 3's
        artifact stays executable)."""
        from sequitr_tpu.studies import roofline

        rows, summary = roofline.run(size=64, iters=2)
        stages = [r["stage"] for r in rows]
        assert stages[0] == "normalize" and "head" in stages[-1]
        assert len(stages) == 9  # norm + enc0-3 + dec2-0 + head
        assert all(r["ms"] > 0 for r in rows)
        assert summary["fused_ms"] > 0
        # analytic FLOP total consistent between sliced rows and summary
        assert abs(sum(r["gflop"] for r in rows) - summary["gflop"]) < 0.1


class TestPolyphase:
    """Exactness of the polyphase serving reformulation (round-4 verdict
    item 3): the SAME weights, rearranged, must reproduce the production
    forward up to float reassociation."""

    def _model(self, **kw):
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.models import unet

        cfg = unet.UNetConfig(
            in_channels=kw.pop("in_channels", 1),
            num_classes=kw.pop("num_classes", 3),
            depth=kw.pop("depth", 4),
            base_features=8,
            norm=kw.pop("norm", "batch"),
            compute_dtype=jnp.float32,
            **kw,
        )
        params, st = unet.init(jax.random.PRNGKey(0), cfg)
        return unet.fold_batchnorm(cfg, params, st)

    def test_matches_production_forward(self):
        import jax.numpy as jnp
        import numpy as np

        from sequitr_tpu.models import unet
        from sequitr_tpu.studies import polyphase_conv as ppc

        fcfg, fp, fs = self._model()
        x = jnp.asarray(
            np.random.default_rng(0).gamma(2.0, 100.0, (2, 64, 64, 1)),
            jnp.float32,
        )
        yb = np.asarray(unet.apply(fcfg, fp, fs, x, False)[0])
        yp = np.asarray(ppc.polyphase_apply(fcfg, fp, fs, x))
        err = np.max(np.abs(yb - yp)) / max(np.max(np.abs(yb)), 1e-9)
        assert err < 1e-5, err
        # reassociation can flip argmax only where two logits tie to
        # ~1e-4 absolute — allow that sliver, nothing more
        agree = np.mean(np.argmax(yb, -1) == np.argmax(yp, -1))
        assert agree >= 0.999, agree

    def test_multichannel_multiclass_shallow(self):
        import jax.numpy as jnp
        import numpy as np

        from sequitr_tpu.models import unet
        from sequitr_tpu.studies import polyphase_conv as ppc

        fcfg, fp, fs = self._model(
            in_channels=3, num_classes=5, depth=3, norm="none"
        )
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32
        )
        yb = np.asarray(unet.apply(fcfg, fp, fs, x, False)[0])
        yp = np.asarray(ppc.polyphase_apply(fcfg, fp, fs, x))
        err = np.max(np.abs(yb - yp)) / max(np.max(np.abs(yb)), 1e-9)
        assert err < 1e-5, err

    def test_phase_kernel_structure(self):
        """9 of every 36 (tap, phase-pair) slots nonzero; total mass
        preserved 4x (each original tap appears once per output phase)."""
        import numpy as np

        from sequitr_tpu.studies import polyphase_conv as ppc

        rng = np.random.default_rng(0)
        w = rng.normal(size=(3, 3, 2, 3)).astype(np.float32)
        pw = ppc.phase_kernel(w)
        assert pw.shape == (3, 3, 8, 12)
        blocks = pw.reshape(3, 3, 4, 2, 4, 3)
        nonzero = sum(
            1
            for sy in range(3)
            for sx in range(3)
            for pi in range(4)
            for po in range(4)
            if np.any(blocks[sy, sx, pi, :, po, :])
        )
        assert nonzero == 9 * 4  # 9 taps for each of the 4 output phases
        assert np.isclose(np.sum(np.abs(pw)), 4 * np.sum(np.abs(w)))

    def test_rejects_unsupported_configs(self):
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from sequitr_tpu.studies import polyphase_conv as ppc

        fcfg, fp, fs = self._model(norm="none")
        x = jnp.asarray(np.zeros((1, 32, 32, 1)), jnp.float32)
        import dataclasses

        bad = dataclasses.replace(fcfg, norm="batch")
        with pytest.raises(ValueError):
            ppc.polyphase_apply(bad, fp, fs, x)
        bad = dataclasses.replace(fcfg, upsample="resize")
        with pytest.raises(ValueError):
            ppc.polyphase_apply(bad, fp, fs, x)
