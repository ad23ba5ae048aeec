"""Mosaic stitching: pairwise strip estimates, global solve, blend.

Fixtures are band-limited periodic scenes (FFT low-pass of white noise)
so `registration.apply_shift`'s Fourier resample is EXACT when cutting
sub-pixel-displaced tiles — estimator accuracy is then tested against
analytic truth, not against another interpolator's error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sequitr_tpu import mosaic
from sequitr_tpu.ops import registration as reg_lib


def _scene(shape, seed, sigma=0.10):
    """Band-limited PERIODIC scene (shared fixture helper)."""
    from sequitr_tpu.data.synthetic import bandlimited_scene

    return bandlimited_scene(
        shape, np.random.default_rng(seed), sigma=sigma, amp=60.0
    )


def _cut_tiles(scene, grid, tile, overlap, jitter, seed):
    """Cut (R*C, H, W) tiles at grid spacing + per-tile jitter using the
    EXACT Fourier shift (tile 0 unjittered anchors the frame). Returns
    (tiles, true_positions)."""
    r, c = grid
    h, w = tile
    step_y, step_x = h - overlap, w - overlap
    rng = np.random.default_rng(seed)
    tiles, pos = [], []
    margin = 8
    for ri in range(r):
        for ci in range(c):
            jy = jx = 0.0
            if (ri, ci) != (0, 0):
                jy, jx = rng.uniform(-jitter, jitter, 2)
            y0 = ri * step_y + jy + margin
            x0 = ci * step_x + jx + margin
            iy, ix = int(np.floor(y0)), int(np.floor(x0))
            fy, fx = y0 - iy, x0 - ix
            shifted = np.asarray(
                reg_lib.apply_shift(
                    jnp.asarray(scene), jnp.asarray([-fy, -fx], jnp.float32)
                )
            )
            tiles.append(shifted[iy : iy + h, ix : ix + w])
            pos.append((y0, x0))
    return np.stack(tiles), np.asarray(pos, np.float64)


class TestOverlapNormalization:
    def test_int_fraction_pair(self):
        assert mosaic.normalize_overlap(24, (128, 128)) == (24, 24)
        assert mosaic.normalize_overlap(0.25, (128, 192)) == (32, 48)
        assert mosaic.normalize_overlap([16, 0.125], (128, 192)) == (16, 24)

    def test_float_integral_is_pixels(self):
        assert mosaic.normalize_overlap(24.0, (128, 128)) == (24, 24)

    @pytest.mark.parametrize(
        "bad", [2, 100, 1.5, -0.1, [8, 8, 8]]
    )
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            mosaic.normalize_overlap(bad, (128, 128))


class TestStitchGrid:
    def test_integer_offsets_exact(self):
        """Integer jitter + subpixel=False: positions exact, mosaic
        reproduces the scene bit-for-bit wherever covered."""
        scene = _scene((360, 420), seed=1)
        r, c, h, w, ov = 2, 3, 140, 150, 28
        step_y, step_x = h - ov, w - ov
        rng = np.random.default_rng(2)
        tiles, pos = [], []
        for ri in range(r):
            for ci in range(c):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -3, 4, 2
                )
                y0, x0 = ri * step_y + 8 + jy, ci * step_x + 8 + jx
                tiles.append(scene[y0 : y0 + h, x0 : x0 + w])
                pos.append((y0, x0))
        tiles, pos = np.stack(tiles), np.asarray(pos, np.float64)
        res = mosaic.stitch_grid(
            tiles, (r, c), overlap=ov, subpixel=False
        )
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(res.positions, rel, atol=1e-6)
        # overlaps carry identical content, so the blend is exact
        # wherever ANY tile covers the canvas (jitter leaves uncovered
        # zeros at the rim)
        oy, ox = (
            int(pos[:, 0].min()),
            int(pos[:, 1].min()),
        )
        want = scene[
            oy : oy + res.mosaic.shape[0], ox : ox + res.mosaic.shape[1]
        ]
        covered = np.zeros(res.mosaic.shape, bool)
        rel_i = res.positions.astype(np.int64)
        for y0, x0 in rel_i:
            covered[y0 : y0 + h, x0 : x0 + w] = True
        assert covered.mean() > 0.9
        np.testing.assert_allclose(
            res.mosaic[covered], want[covered], atol=2e-4
        )
        assert res.used.all()
        assert res.rms_residual < 0.02

    def test_near_integer_positions_snap(self):
        """Positions within 1e-3 px of an integer are estimator float
        noise, not a real fraction: without the snap, a 224±1e-5 position
        triggers the wrap-zeroed leading row/col — observed as a 1-px rim
        that DIFFERED between TPU- and CPU-backend runs of the same data
        (BASELINE.md round-4 continuation-6)."""
        scene = _scene((64, 64), 21)
        tiles = scene[None].astype(np.float32)
        exact = mosaic.blend_mosaic(
            tiles, np.asarray([[0.0, 0.0]]), (8, 8), subpixel=True
        )
        for eps in (1e-5, -1e-5):
            noisy = mosaic.blend_mosaic(
                tiles, np.asarray([[eps, eps]]), (8, 8), subpixel=True
            )
            assert noisy.shape == exact.shape
            # no zeroed rim: every pixel carries the scene
            assert (noisy != 0).all()
            np.testing.assert_allclose(noisy, exact, atol=1e-4)
        # a REAL fraction still takes the sub-pixel path (wrapped leading
        # row/col zeroed; canvas grows by the floor/ceil of the shift)
        frac = mosaic.blend_mosaic(
            tiles, np.asarray([[0.25, 0.25]]), (8, 8), subpixel=True
        )
        assert (frac[0, :] == 0).all() and (frac[:, 0] == 0).all()

    def test_subpixel_recovery(self):
        """Sub-pixel jitter recovered well under 0.05 px on exact
        Fourier-cut tiles; composite matches the scene closely."""
        scene = _scene((380, 400), seed=3)
        tiles, pos = _cut_tiles(
            scene, (2, 3), (150, 140), overlap=30, jitter=2.5, seed=4
        )
        res = mosaic.stitch_grid(tiles, (2, 3), overlap=30, refine=3)
        rel = pos - pos.min(axis=0, keepdims=True)
        assert np.abs(res.positions - rel).max() < 0.05
        assert res.rms_residual < 0.05
        assert res.responses.min() > 5.0
        # composite vs scene (interior: away from the unblended rim)
        oy = pos[:, 0].min()
        ox = pos[:, 1].min()
        iy, ix = int(np.floor(oy)), int(np.floor(ox))
        hm, wm = res.mosaic.shape
        want = scene[iy : iy + hm, ix : ix + wm]
        inner = (slice(6, hm - 6), slice(6, wm - 6))
        err = np.abs(res.mosaic[inner] - want[inner])
        # positions are recovered to <0.05 px but the canvas is only
        # integer-aligned to the scene; allow the sub-pixel residual
        assert np.percentile(err, 95) < 0.40 * scene.std()

    def test_snake_order(self):
        """Serpentine acquisition stitches identically to row-major."""
        scene = _scene((300, 300), seed=5)
        tiles, pos = _cut_tiles(
            scene, (2, 2), (140, 140), overlap=24, jitter=1.5, seed=6
        )
        row = mosaic.stitch_grid(tiles, (2, 2), overlap=24)
        snake_in = tiles[[0, 1, 3, 2]]  # acquisition order, row 1 reversed
        snake = mosaic.stitch_grid(
            snake_in, (2, 2), overlap=24, order="snake"
        )
        np.testing.assert_allclose(snake.positions, row.positions)
        np.testing.assert_allclose(snake.mosaic, row.mosaic)

    def test_low_confidence_fallback(self):
        """A featureless tile's seams fall back to nominal spacing: it
        lands at grid spacing instead of shearing the mosaic."""
        scene = _scene((300, 300), seed=7)
        tiles, pos = _cut_tiles(
            scene, (2, 2), (140, 140), overlap=24, jitter=1.0, seed=8
        )
        tiles = tiles.copy()
        tiles[3] = 100.0  # blank field: empty glass
        res = mosaic.stitch_grid(
            tiles, (2, 2), overlap=24, min_response=8.0
        )
        assert not res.used.all()  # blank seams gated
        # the blank tile sits at nominal spacing from its neighbours
        nominal = np.asarray([116.0, 116.0])
        blank_rel = res.positions[3] - res.positions[0]
        assert np.abs(blank_rel - nominal).max() < 1.2
        # confident tiles unaffected
        rel = pos - pos.min(axis=0, keepdims=True)
        assert np.abs(res.positions[:3] - rel[:3]).max() < 0.1

    def test_estimate_only_and_single_tile(self):
        scene = _scene((220, 300), seed=9)
        tiles, _ = _cut_tiles(
            scene, (1, 2), (140, 140), overlap=24, jitter=1.0, seed=10
        )
        res = mosaic.stitch_grid(tiles, (1, 2), overlap=24, blend=False)
        assert res.mosaic is None and len(res.edges) == 1
        one = mosaic.stitch_grid(tiles[:1], (1, 1), overlap=24)
        np.testing.assert_allclose(one.mosaic, tiles[0])
        assert len(one.edges) == 0

    def test_validation_errors(self):
        t = np.zeros((4, 64, 64), np.float32)
        with pytest.raises(ValueError, match="grid"):
            mosaic.stitch_grid(t, (2, 3), overlap=16)
        with pytest.raises(ValueError, match="order"):
            mosaic.stitch_grid(t, (2, 2), overlap=16, order="spiral")
        with pytest.raises(ValueError, match="single-channel"):
            mosaic.stitch_grid(
                np.zeros((4, 64, 64, 2), np.float32), (2, 2), overlap=16
            )


class TestSolvePositions:
    def test_overdetermined_consistency(self):
        """A consistent synthetic offset set is reproduced exactly; an
        inconsistent edge is split per weights and reported in the
        residual."""
        edges = np.asarray([[0, 1], [0, 2], [1, 3], [2, 3]])
        true = np.asarray([[0, 0], [0, 100], [90, 0], [90, 100]], float)
        d = true[edges[:, 1]] - true[edges[:, 0]]
        nom = d.copy()
        resp = np.full(4, 20.0)
        p, used, rms = mosaic.solve_positions(4, edges, d, resp, nom)
        np.testing.assert_allclose(p, true, atol=1e-9)
        assert rms < 1e-9 and used.all()
        d2 = d.copy()
        d2[3, 1] += 2.0  # inconsistent loop
        p2, _, rms2 = mosaic.solve_positions(4, edges, d2, resp, nom)
        assert rms2 > 0.3
        assert np.abs(p2 - true).max() < 2.0


class TestDataParallelSeams:
    def test_dp_correlator_matches_default(self):
        """Seam pairs sharded over the virtual mesh produce the same
        offsets/responses as the single-device dispatch (7 tiles in a
        row: 6 seams over 8 devices exercises the pad-to-mesh path)."""
        import jax

        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        from sequitr_tpu import parallel

        scene = _scene((200, 900), seed=12)
        tiles, _ = _cut_tiles(
            scene, (1, 7), (150, 120), overlap=24, jitter=2.0, seed=13
        )
        e1, d1, r1, n1 = mosaic.pair_offsets(tiles, (1, 7), (24, 24))
        dp = parallel.make_dp_seam_correlator(parallel.make_mesh())
        e2, d2, r2, n2 = mosaic.pair_offsets(
            tiles, (1, 7), (24, 24), correlate=dp
        )
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_allclose(d1, d2, atol=1e-5)
        np.testing.assert_allclose(r1, r2, rtol=1e-4)
        np.testing.assert_array_equal(n1, n2)


class TestFlatField:
    def test_recovers_vignette(self):
        """A quadratic radial vignette applied to every tile is
        recovered (to a global scale) by the median+poly estimate."""
        scene = _scene((400, 540), seed=21)
        tiles, _ = _cut_tiles(
            scene, (3, 3), (128, 168), overlap=24, jitter=1.5, seed=22
        )
        yy = np.linspace(-1, 1, 128)[:, None]
        xx = np.linspace(-1, 1, 168)[None, :]
        vig = (1.0 - 0.35 * (yy**2 + xx**2)).astype(np.float32)
        prof = mosaic.estimate_flatfield(tiles * vig)
        want = vig / vig.mean()
        assert prof.mean() == pytest.approx(1.0, abs=1e-3)
        rel = np.abs(prof - want) / want
        assert rel.max() < 0.05, rel.max()

    def test_no_vignette_is_flat(self):
        scene = _scene((300, 300), seed=23)
        tiles, _ = _cut_tiles(
            scene, (2, 2), (140, 140), overlap=24, jitter=1.0, seed=24
        )
        prof = mosaic.estimate_flatfield(tiles)
        assert np.abs(prof - 1.0).max() < 0.05

    def test_validation(self):
        with pytest.raises(ValueError, match="order"):
            mosaic.estimate_flatfield(
                np.ones((4, 32, 32), np.float32), order=0
            )
        with pytest.raises(ValueError, match="tiles"):
            mosaic.estimate_flatfield(np.ones((32, 32), np.float32))


class TestGainMatching:
    def test_recovers_per_tile_gains(self):
        """Per-tile multiplicative gains applied to exact-cut tiles are
        recovered to ~1% from overlap strip-median ratios."""
        scene = _scene((400, 540), seed=31)
        tiles, _ = _cut_tiles(
            scene, (3, 3), (128, 168), overlap=28, jitter=0.0, seed=32
        )
        rng = np.random.default_rng(33)
        true_g = rng.uniform(0.7, 1.3, 9).astype(np.float32)
        true_g /= np.exp(np.log(true_g).mean())  # product 1, like solver
        got = mosaic.solve_tile_gains(
            tiles * true_g[:, None, None], (3, 3), (28, 28)
        )
        # correction g multiplies: corrected = damaged * got; exact when
        # got == 1/true_g
        np.testing.assert_allclose(got * true_g, 1.0, atol=0.02)

    def test_blank_seams_keep_unit_gain(self):
        tiles = np.zeros((4, 64, 64), np.float32)  # every overlap blank
        g = mosaic.solve_tile_gains(tiles, (2, 2), (16, 16))
        np.testing.assert_allclose(g, 1.0, atol=1e-6)


class TestAutoOverlap:
    def test_recovers_known_overlap(self):
        scene = _scene((400, 540), seed=41)
        tiles, _ = _cut_tiles(
            scene, (3, 3), (128, 168), overlap=36, jitter=1.5, seed=42
        )
        ov = mosaic.estimate_overlap(tiles, (3, 3))
        assert abs(ov[0] - 36) <= 2 and abs(ov[1] - 36) <= 2

    def test_auto_stitch_matches_explicit(self):
        scene = _scene((380, 400), seed=43)
        tiles, pos = _cut_tiles(
            scene, (2, 3), (150, 140), overlap=30, jitter=2.0, seed=44
        )
        auto = mosaic.stitch_grid(tiles, (2, 3), overlap="auto")
        rel = pos - pos.min(axis=0, keepdims=True)
        assert np.abs(auto.positions - rel).max() < 0.05

    def test_asymmetric_overlap(self):
        scene = _scene((400, 400), seed=45)
        r, c, h, w = 2, 2, 160, 150
        ov_y, ov_x = 24, 48
        tiles = []
        for ri in range(r):
            for ci in range(c):
                y0, x0 = ri * (h - ov_y) + 8, ci * (w - ov_x) + 8
                tiles.append(scene[y0 : y0 + h, x0 : x0 + w])
        ov = mosaic.estimate_overlap(np.stack(tiles), (2, 2))
        assert abs(ov[0] - ov_y) <= 1 and abs(ov[1] - ov_x) <= 1

    def test_featureless_raises(self):
        tiles = np.full((4, 96, 96), 50.0, np.float32)
        with pytest.raises(ValueError, match="overlap explicitly"):
            mosaic.estimate_overlap(tiles, (2, 2))
        with pytest.raises(ValueError, match="'auto'"):
            mosaic.stitch_grid(tiles, (2, 2), overlap="automatic")
