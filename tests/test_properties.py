"""Seeded property tests: randomized round-trip invariants.

The unit suites pin specific shapes; these sweep randomized configurations
of the load-bearing invariants (codec exactness, tile->stitch identity,
augmentation determinism) so shape-dependent edge cases (odd sizes,
non-divisible grids, tiny frames) can't regress silently.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sequitr_tpu.data import records, tiff  # noqa: E402
from sequitr_tpu.ops import augment, tiling  # noqa: E402


class TestTiffRoundTrip:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_stack_exact(self, tmp_path, seed):
        rng = np.random.default_rng(seed)
        t = int(rng.integers(1, 4))
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        dtype = rng.choice([np.uint8, np.uint16, np.float32])
        if dtype == np.float32:
            stack = rng.normal(size=(t, h, w)).astype(np.float32)
        else:
            stack = rng.integers(0, np.iinfo(dtype).max, (t, h, w)).astype(dtype)
        path = str(tmp_path / f"s{seed}.tif")
        tiff.write_stack(path, stack)
        back = np.asarray(tiff.read_stack(path))
        assert back.dtype == stack.dtype, (seed, stack.shape, dtype)
        np.testing.assert_array_equal(back.reshape(stack.shape), stack)


class TestStreamingTiffProperties:
    @pytest.mark.parametrize("seed", range(6))
    def test_append_writer_lazy_reader_roundtrip(self, tmp_path, seed):
        """Random stacks through the STREAMING writer + lazy reader (both
        classic and BigTIFF) round-trip exactly."""
        rng = np.random.default_rng(100 + seed)
        t = int(rng.integers(1, 5))
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        dtype = rng.choice([np.uint8, np.uint16, np.int32, np.float16, np.float32])
        big = bool(rng.integers(0, 2))
        if np.issubdtype(dtype, np.floating):
            stack = rng.normal(size=(t, h, w)).astype(dtype)
        else:
            info = np.iinfo(dtype)
            stack = rng.integers(info.min, info.max, (t, h, w)).astype(dtype)
        path = str(tmp_path / f"s{seed}.tif")
        with tiff.TiffAppendWriter(path, bigtiff=big) as wtr:
            for frame in stack:
                wtr.append(frame)
        with tiff.TiffReader(path) as r:
            assert r.shape == (t, h, w)
            got = np.stack(list(r))
        assert got.dtype == stack.dtype
        np.testing.assert_array_equal(got, stack)
        np.testing.assert_array_equal(
            np.asarray(tiff.read_stack(path)).reshape(stack.shape), stack
        )

    @pytest.mark.parametrize("seed", range(3))
    def test_frame_source_multichannel_roundtrip(self, tmp_path, seed):
        """FrameSource over N channel files reproduces the stacked array
        in native dtype, frame by frame and in chunks."""
        from sequitr_tpu.data.source import FrameSource

        rng = np.random.default_rng(200 + seed)
        t = int(rng.integers(2, 6))
        h, w = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        c = int(rng.integers(1, 4))
        chans = [
            (rng.random((t, h, w)) * 999).astype(np.uint16) for _ in range(c)
        ]
        paths = []
        for i, ch in enumerate(chans):
            p = str(tmp_path / f"c{seed}_{i}.tif")
            tiff.write_stack(p, ch)
            paths.append(p)
        expect = np.stack(chans, axis=-1) if c > 1 else chans[0]
        with FrameSource(paths=paths) as src:
            assert len(src) == t and src.spatial == (h, w)
            assert src.n_channels == c
            for i in range(t):
                f = src.frame(i)
                assert f.dtype == np.uint16
                np.testing.assert_array_equal(f, expect[i])
            fb = int(rng.integers(1, t + 2))
            got = np.concatenate(list(src.chunks(fb)))[:t]
            np.testing.assert_array_equal(got, expect)


class TestRecordsRoundTrip:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_examples_exact(self, tmp_path, seed):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(1, 5))
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        c = int(rng.choice([1, 2, 3]))
        exs = []
        for _ in range(n):
            img = rng.normal(size=(h, w, c)).astype(np.float32)
            img = img[..., 0] if c == 1 else img
            lab = rng.integers(0, 5, (h, w)).astype(np.int32)
            wm = rng.random((h, w)).astype(np.float32)
            exs.append(records.SegExample(img, lab, wm))
        paths = records.write_segmentation_shards(
            str(tmp_path / "t"), exs, shard_size=int(rng.integers(1, n + 1))
        )
        back = list(records.read_segmentation_examples(paths))
        assert len(back) == n
        for a, b in zip(exs, back):
            img_a = a.image if a.image.ndim == 3 else a.image[..., None]
            img_b = b.image if b.image.ndim == 3 else b.image[..., None]
            np.testing.assert_array_equal(img_b, img_a)
            np.testing.assert_array_equal(b.labels, a.labels)
            np.testing.assert_array_equal(b.weights, a.weights)


class TestTileStitchIdentity:
    @pytest.mark.parametrize("seed", range(8))
    def test_constant_field_identity_2d(self, seed):
        """Stitching softmax-like patches of a constant field reproduces the
        field for ANY (frame, patch, overlap) combination — the invariant
        the weighted blend is built on."""
        rng = np.random.default_rng(200 + seed)
        ph = int(rng.choice([8, 16, 24]))
        pw = int(rng.choice([8, 16, 24]))
        h = ph + int(rng.integers(0, 33))
        w = pw + int(rng.integers(0, 33))
        oy = int(rng.integers(0, ph // 2 + 1))
        ox = int(rng.integers(0, pw // 2 + 1))
        grid = tiling.tile_grid((h, w), (ph, pw), (oy, ox))
        field = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
        patches = tiling.extract_patches(field, grid, (ph, pw))
        out = tiling.stitch_patches(patches, grid, (h, w), (oy, ox), "hann")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(field), atol=1e-5,
            err_msg=f"h={h} w={w} patch=({ph},{pw}) ov=({oy},{ox})",
        )

    @pytest.mark.parametrize("seed", range(4))
    def test_constant_field_identity_3d(self, seed):
        """The volumetric grid (Z, H, W) stitches exactly too — the 3D
        serving path's multi-tile correctness, independent of any net."""
        rng = np.random.default_rng(500 + seed)
        pz, ph, pw = 4, 8, 8
        z = pz + int(rng.integers(0, 9))
        h = ph + int(rng.integers(0, 17))
        w = pw + int(rng.integers(0, 17))
        ov = (int(rng.integers(0, 3)), int(rng.integers(0, 5)), int(rng.integers(0, 5)))
        grid = tiling.tile_grid((z, h, w), (pz, ph, pw), ov)
        field = jnp.asarray(rng.random((z, h, w, 2)).astype(np.float32))
        patches = tiling.extract_patches(field, grid, (pz, ph, pw))
        out = tiling.stitch_patches(patches, grid, (z, h, w), ov, "hann")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(field), atol=1e-5,
            err_msg=f"zhw=({z},{h},{w}) ov={ov} tiles={len(grid)}",
        )

    @pytest.mark.parametrize("seed", range(3))
    def test_scan_forms_match_unrolled(self, seed):
        rng = np.random.default_rng(300 + seed)
        h = w = 40
        grid = tiling.tile_grid((h, w), (8, 8), (4, 4))
        field = jnp.asarray(rng.random((h, w, 2)).astype(np.float32))
        pa = tiling.extract_patches(field, grid, (8, 8))
        pb = tiling.extract_patches_scan(field, grid, (8, 8))
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=0)
        sa = tiling.stitch_patches(pa, grid, (h, w), (4, 4), "hann")
        sb = tiling.stitch_patches_scan(pa, grid, (h, w), (4, 4), "hann")
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-6)


class TestAugmentProperties:
    @pytest.mark.parametrize("seed", range(4))
    def test_deterministic_and_label_preserving(self, seed):
        rng = np.random.default_rng(400 + seed)
        h = int(rng.choice([16, 24, 32]))
        key = jax.random.PRNGKey(seed)
        img = jnp.asarray(rng.random((h, h, 1)).astype(np.float32))
        lab = jnp.asarray(rng.integers(0, 3, (h, h)).astype(np.int32))
        wm = jnp.asarray(rng.random((h, h)).astype(np.float32) + 0.5)
        a = augment.augment_example(key, img, lab, wm)
        b = augment.augment_example(key, img, lab, wm)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # labels stay in the input's value set (NN resample, no blending)
        assert set(np.unique(np.asarray(a[1]))) <= set(np.unique(np.asarray(lab)))
        # weights stay within the input range (convex bilinear combination)
        assert float(jnp.min(a[2])) >= float(jnp.min(wm)) - 1e-5
        assert float(jnp.max(a[2])) <= float(jnp.max(wm)) + 1e-5


class TestRegistrationProperties:
    """Randomized invariants of the phase-correlation estimator."""

    def _scene(self, rng, shape):
        f = np.fft.fftn(rng.normal(0, 1, shape))
        grids = np.meshgrid(
            *[np.fft.fftfreq(n) for n in shape], indexing="ij"
        )
        r2 = sum(g**2 for g in grids)
        return (
            np.fft.ifftn(f * np.exp(-r2 / (2 * 0.1**2))).real * 50 + 110
        ).astype(np.float32)

    @pytest.mark.parametrize("seed", range(6))
    def test_estimate_inverts_random_subpixel_shift(self, seed):
        """For any within-range shift s: estimating mov=shift(base, s)
        against base recovers -s, and applying the estimate undoes the
        motion — regardless of odd/even or non-square shapes."""
        from sequitr_tpu.ops import registration as reg

        rng = np.random.default_rng(seed)
        shape = (int(rng.integers(33, 97)), int(rng.integers(33, 97)))
        base = self._scene(rng, shape)
        s = rng.uniform(-4, 4, 2).astype(np.float32)
        mov = np.asarray(reg.apply_shift(jnp.asarray(base), jnp.asarray(s)))
        est, resp = reg.phase_correlate(
            jnp.asarray(base), jnp.asarray(mov), refine=3
        )
        assert np.abs(np.asarray(est) + s).max() < 0.05, (shape, s)
        assert float(resp) > 5
        back = np.asarray(reg.apply_shift(jnp.asarray(mov), est))
        span = base.max() - base.min()
        assert np.abs(back - base).mean() < 0.01 * span

    @pytest.mark.parametrize("seed", range(4))
    def test_antisymmetry(self, seed):
        """phase_correlate(a, b) == -phase_correlate(b, a) (within the
        estimator's own accuracy) — the estimate is a displacement, so
        swapping roles must flip its sign, not change its magnitude."""
        from sequitr_tpu.ops import registration as reg

        rng = np.random.default_rng(100 + seed)
        base = self._scene(rng, (64, 64))
        s = rng.uniform(-3, 3, 2).astype(np.float32)
        mov = np.asarray(reg.apply_shift(jnp.asarray(base), jnp.asarray(s)))
        ab, _ = reg.phase_correlate(jnp.asarray(base), jnp.asarray(mov))
        ba, _ = reg.phase_correlate(jnp.asarray(mov), jnp.asarray(base))
        assert np.abs(np.asarray(ab) + np.asarray(ba)).max() < 0.02

    @pytest.mark.parametrize("seed", range(4))
    def test_unwrap_then_crop_never_selects_stale_rows(self, seed):
        """Random monotonic drifts (possibly crossing N/2): unwrapped
        trajectories are continuous (no ~N jumps) and common_crop bounds
        stay inside the frame."""
        from sequitr_tpu.ops import registration as reg

        rng = np.random.default_rng(200 + seed)
        n = int(rng.integers(40, 90))
        steps = rng.uniform(-1.5, 1.5, 2) * np.ones((6, 2))
        truth = np.vstack([[0.0, 0.0], np.cumsum(steps, 0)])
        # wrap each estimate into the canonical interval like the
        # estimator reports them
        est = (truth + n / 2) % n - n / 2
        unwrapped = reg.unwrap_trajectory(est, (n, n))
        assert np.abs(np.diff(unwrapped, axis=0) - steps).max() < 1e-9
        span = truth.max(0) - truth.min(0)
        if (span < n - 2).all():
            sly, slx = reg.common_crop(unwrapped, (n, n))
            for sl in (sly, slx):
                assert 0 <= sl.start < sl.stop <= n


class TestMosaicProperties:
    """Randomized invariants of the stitching stack (grid shapes,
    overlaps and jitters the unit suite doesn't pin)."""

    @staticmethod
    def _setup(seed):
        from sequitr_tpu.data.synthetic import bandlimited_scene
        from sequitr_tpu.ops import registration as reg

        rng = np.random.default_rng(seed)
        r = int(rng.integers(1, 4))
        c = int(rng.integers(1, 4))
        if r * c == 1:
            c = 2
        h = int(rng.integers(80, 140))
        w = int(rng.integers(80, 140))
        ov = int(rng.integers(16, min(h, w) // 2))
        jitter = float(rng.uniform(0.5, 2.0))
        scene = bandlimited_scene(
            ((r - 1) * (h - ov) + h + 16, (c - 1) * (w - ov) + w + 16),
            rng, amp=60.0,
        )
        tiles, pos = [], []
        for ri in range(r):
            for ci in range(c):
                jy = jx = 0.0
                if (ri, ci) != (0, 0):
                    jy, jx = rng.uniform(-jitter, jitter, 2)
                y0, x0 = ri * (h - ov) + 8 + jy, ci * (w - ov) + 8 + jx
                iy, ix = int(np.floor(y0)), int(np.floor(x0))
                sh = np.asarray(
                    reg.apply_shift(
                        jnp.asarray(scene),
                        jnp.asarray([iy - y0, ix - x0], jnp.float32),
                    )
                )
                tiles.append(sh[iy : iy + h, ix : ix + w])
                pos.append((y0, x0))
        return (r, c), ov, np.stack(tiles), np.asarray(pos)

    @pytest.mark.parametrize("seed", range(5))
    def test_positions_recovered(self, seed):
        from sequitr_tpu import mosaic

        grid, ov, tiles, pos = self._setup(100 + seed)
        res = mosaic.stitch_grid(tiles, grid, overlap=ov, blend=False)
        rel = pos - pos.min(axis=0, keepdims=True)
        assert np.abs(res.positions - rel).max() < 0.1, (grid, ov)
        assert res.rms_residual < 0.1

    @pytest.mark.parametrize("seed", range(4))
    def test_gain_solver_inverts_random_gains(self, seed):
        from sequitr_tpu import mosaic

        grid, ov, tiles, _ = self._setup(200 + seed)
        rng = np.random.default_rng(300 + seed)
        g = rng.uniform(0.6, 1.5, len(tiles)).astype(np.float32)
        g /= np.exp(np.log(g).mean())
        got = mosaic.solve_tile_gains(
            tiles * g[:, None, None], grid, (ov, ov)
        )
        np.testing.assert_allclose(got * g, 1.0, atol=0.05)

    @pytest.mark.parametrize("seed", range(4))
    def test_overlap_estimated_within_jitter(self, seed):
        from sequitr_tpu import mosaic

        grid, ov, tiles, _ = self._setup(400 + seed)
        est = mosaic.estimate_overlap(tiles, grid)
        if grid[0] > 1:
            assert abs(est[0] - ov) <= 4, (grid, ov, est)
        if grid[1] > 1:
            assert abs(est[1] - ov) <= 4, (grid, ov, est)


class TestIlluminationProperties:
    """Randomized invariants of the illumination estimators: identity on
    clean data, inversion of known corruptions, degeneracy safety."""

    @pytest.mark.parametrize("seed", range(6))
    def test_fit_shading_inverts_random_vignette(self, seed):
        """fit_shading on (moving scene x random smooth profile) recovers
        the profile up to its mean, at random sizes/strengths/orders."""
        from sequitr_tpu.data.synthetic import bandlimited_scene
        from sequitr_tpu.ops import illumination as illum

        rng = np.random.default_rng(seed)
        h = int(rng.integers(33, 80))
        w = int(rng.integers(33, 80))
        n = int(rng.integers(12, 28))
        big = bandlimited_scene(
            (h + n, w + n), rng, sigma=0.08, amp=40.0
        ) + 90.0
        yy, xx = np.meshgrid(
            np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
        )
        a = float(rng.uniform(0.1, 0.4))
        b = float(rng.uniform(-0.15, 0.15))
        vig = 1.0 - a * (yy**2 + xx**2) + b * yy
        frames = np.stack(
            [big[k : k + h, k : k + w] * vig for k in range(n)]
        ).astype(np.float32)
        prof = illum.fit_shading(frames, order=2)
        want = vig / vig.mean()
        assert np.abs(prof - want).max() < 0.06

    @pytest.mark.parametrize("seed", range(6))
    def test_flat_input_estimates_identity(self, seed):
        """No vignette, no bleach -> profile ~1 and gains ~1 for any
        scene: the corrections never invent a correction."""
        from sequitr_tpu.data.synthetic import bandlimited_scene
        from sequitr_tpu.ops import illumination as illum

        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(8, 20))
        frames = np.stack(
            [
                bandlimited_scene((48, 48), rng, sigma=0.1, amp=30.0) + 70.0
                for _ in range(n)
            ]
        ).astype(np.float32)
        prof = illum.fit_shading(frames)
        assert np.abs(prof - 1.0).max() < 0.06
        meds = np.median(frames, axis=(1, 2))
        gains, rate = illum.estimate_bleach_exp(np.arange(n), meds, n)
        assert abs(rate) < 0.01
        assert np.abs(gains - 1.0).max() < 0.1

    @pytest.mark.parametrize("seed", range(6))
    def test_bleach_fit_inverts_random_decay(self, seed):
        """gains x exp-decayed medians is flat for random rates, sample
        spacings and noise-free series."""
        from sequitr_tpu.ops import illumination as illum

        rng = np.random.default_rng(200 + seed)
        n = int(rng.integers(20, 120))
        rate = float(rng.uniform(-0.05, 0.08))
        k = int(rng.integers(2, 6))
        t = np.arange(0, n, k)
        level = float(rng.uniform(10, 500))
        meds = level * np.exp(-rate * t)
        gains, got_rate = illum.estimate_bleach_exp(t, meds, n)
        assert got_rate == pytest.approx(rate, abs=1e-6)
        restored = level * np.exp(-rate * np.arange(n)) * gains
        keep = gains < 19.9  # ignore the safety clip region
        np.testing.assert_allclose(restored[keep], level, rtol=1e-4)

    @pytest.mark.parametrize("seed", range(4))
    def test_corrector_modes_agree_on_clean_data(self, seed):
        """On an unshaded constant-median stack, exp/ratio/none all
        return the input unchanged (gain 1 everywhere)."""
        from sequitr_tpu.ops import illumination as illum

        rng = np.random.default_rng(300 + seed)
        frame = rng.gamma(2.0, 50.0, (32, 32, 1)).astype(np.float32)
        shading = np.ones((32, 32, 1), np.float32)
        ref = np.median(frame, axis=(0, 1)).astype(np.float32)
        one = np.ones(1, np.float32)
        for mode in ("exp", "ratio", "none"):
            out, med, g = illum.make_corrector(mode)(
                frame, shading, one, ref
            )
            np.testing.assert_allclose(
                np.asarray(out), frame, rtol=1e-5
            )
            assert float(g[0]) == pytest.approx(1.0, abs=1e-4)


class TestN2VMaskProperties:
    """Randomized invariants of the dimension-generic blind-spot mask
    (``train._n2v_mask_nd``): across shapes/radii/dims, every change is at
    a selected position, every substitute comes from inside the per-axis
    window, and NO substitute is ever the position's own value (the
    identity leak that collapses the blind-spot loss)."""

    @pytest.mark.parametrize("seed", range(6))
    def test_mask_invariants_random_shapes_and_radii(self, seed):
        import jax

        from sequitr_tpu.pipeline import train as train_lib

        rng = np.random.default_rng(700 + seed)
        dims = int(rng.integers(2, 4))
        spatial = tuple(int(rng.integers(4, 14)) for _ in range(dims))
        b = int(rng.integers(1, 4))
        c = int(rng.integers(1, 3))
        radii = tuple(
            int(rng.integers(0, s)) for s in spatial
        )
        if max(radii) < 1:  # at least one movable axis
            radii = (1,) + radii[1:] if spatial[0] > 1 else radii
            if max(radii) < 1:
                pytest.skip("degenerate draw")
        n_mask = int(rng.integers(1, 1 + np.prod(spatial) // 2))
        imgs = jnp.asarray(
            rng.normal(0, 1, (b,) + spatial + (c,)), jnp.float32
        )
        masked, coords = train_lib._n2v_mask_nd(
            jax.random.PRNGKey(seed), imgs, n_mask, radii
        )
        m = np.asarray(masked)
        v = np.asarray(imgs)
        coords = [np.asarray(cc) for cc in coords]
        for bi in range(b):
            sel = set(zip(*(cc[bi].tolist() for cc in coords)))
            # every selected position was substituted with a DIFFERENT
            # value (continuous data: equality identifies the source)
            for pos in sel:
                idx = (bi,) + pos
                assert (m[idx] != v[idx]).all(), (seed, idx)
                # substitute lies inside the per-axis window: reflection
                # never leaves it (|reflected - c| <= r, see _n2v_mask_nd)
                # and the tie-break moves only along the fix axis, whose
                # radius is >= 1 — so the EXACT-r block must contain the
                # substituted value (continuous data: membership by value)
                slices = tuple(
                    slice(max(0, p0 - r), p0 + r + 1)
                    for p0, r in zip(pos, radii)
                )
                block = v[bi][slices]
                assert np.isclose(block, m[idx][0]).any(), (seed, idx)
            # nothing outside the selected set changed
            changed = np.argwhere((m[bi] != v[bi]).any(axis=-1))
            for pos in changed:
                assert tuple(pos.tolist()) in sel, (seed, bi, pos)
