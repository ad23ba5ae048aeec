"""Tests: volumetric (3D) and astigmatic emitter localization.

Extends the PSF subsystem (SURVEY.md §2 'PSF modelling') beyond 2D:
true 3D detection+fitting in z-stacks and cylindrical-lens astigmatic
z-from-widths for single-frame 3D SMLM (NEXT.md round-5 extension).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu import psf


def _sigma_curve(z, s0, c, d):
    return s0 * np.sqrt(1.0 + ((z - c) / d) ** 2)


# typical cylindrical-lens setup: foci +/-300 units apart
SX_PARAMS = (1.3, +300.0, 400.0)
SY_PARAMS = (1.3, -300.0, 400.0)


def _make_volume(truth, shape=(21, 64, 64), sigma=1.4, sigma_z=1.6,
                 amp=800.0, bg=50.0, noise=2.0, seed=0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float64)
    vol = np.full(shape, bg)
    for cz, cy, cx in truth:
        vol += amp * np.exp(
            -((zz - cz) ** 2) / (2 * sigma_z**2)
            - ((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)
        )
    return vol + rng.normal(0, noise, shape)


def _make_astig_frame(truth, shape=(96, 96), photons=3000.0, bg=20.0,
                      noise=0.3, seed=1):
    """truth rows are (z, y, x); widths follow the defocus curves."""
    rng = np.random.default_rng(seed)
    fy, fx = np.mgrid[: shape[0], : shape[1]].astype(np.float64)
    frame = np.full(shape, bg)
    for cz, cy, cx in truth:
        sx = _sigma_curve(cz, *SX_PARAMS)
        sy = _sigma_curve(cz, *SY_PARAMS)
        frame += photons / (2 * np.pi * sx * sy) * np.exp(
            -((fy - cy) ** 2) / (2 * sy**2) - ((fx - cx) ** 2) / (2 * sx**2)
        )
    return frame + rng.normal(0, noise, shape)


def _make_bead_scan(zs, shape=(32, 32), by=15.7, bx=16.2, photons=2000.0,
                    bg=20.0, noise=0.3, seed=2):
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[: shape[0], : shape[1]].astype(np.float64)
    stack = np.empty((len(zs),) + shape)
    for i, z in enumerate(zs):
        sx = _sigma_curve(z, *SX_PARAMS)
        sy = _sigma_curve(z, *SY_PARAMS)
        stack[i] = bg + photons / (2 * np.pi * sx * sy) * np.exp(
            -((gy - by) ** 2) / (2 * sy**2) - ((gx - bx) ** 2) / (2 * sx**2)
        )
    return stack + rng.normal(0, noise, stack.shape)


class TestLocalize3D:
    def test_subvoxel_accuracy(self):
        rng = np.random.default_rng(3)
        truth = []
        while len(truth) < 6:  # emitters far enough apart not to overlap
            cand = (
                rng.uniform(5, 15),
                rng.uniform(10, 53),
                rng.uniform(10, 53),
            )
            if all(
                np.linalg.norm(np.subtract(cand, t)[1:]) > 12 for t in truth
            ):
                truth.append(cand)
        vol = _make_volume(truth)
        out = psf.localize_emitters_3d(
            vol, 200.0, sigma=1.4, sigma_z=1.6, window=9, window_z=7
        )
        assert len(out["z"]) == 6
        pts = np.stack([out["z"], out["y"], out["x"]], -1)
        for t in truth:
            err = pts - np.asarray(t)
            i = np.argmin((err**2).sum(1))
            assert abs(err[i, 0]) < 0.08, (t, err[i])  # axial
            assert abs(err[i, 1]) < 0.05 and abs(err[i, 2]) < 0.05, (t, err[i])
        assert (out["amplitude"] > 0).all()
        assert np.allclose(out["background"], 50.0, atol=3.0)

    def test_detect_peaks_3d_static_shapes(self):
        vol = jnp.zeros((8, 16, 16)).at[3, 5, 7].set(5.0).at[6, 10, 2].set(3.0)
        zyx, valid = jax.jit(
            lambda v: psf.detect_peaks_3d(v, threshold=1.0, max_peaks=12)
        )(vol)
        assert zyx.shape == (12, 3) and valid.shape == (12,)
        assert int(valid.sum()) == 2
        found = {tuple(map(int, p)) for p in np.asarray(zyx)[np.asarray(valid)]}
        assert found == {(3, 5, 7), (6, 10, 2)}

    def test_no_peaks(self):
        out = psf.localize_emitters_3d(np.ones((6, 12, 12)), threshold=5.0)
        assert len(out["z"]) == 0

    def test_halfpixel_tie_single_detection(self):
        """A noiseless emitter centered exactly between two voxels makes
        two EQUAL maxima; equality NMS alone would detect it twice
        (caught e2e on a synthetic noiseless volume)."""
        vol = _make_volume([(6.0, 20.0, 25.5)], noise=0.0)
        out = psf.localize_emitters_3d(vol, 200.0)
        assert len(out["z"]) == 1
        assert abs(out["x"][0] - 25.5) < 0.05

        # 2D path has the same tie-break
        img = np.asarray(vol[6])
        out2d = psf.localize_emitters(img, 200.0)
        assert len(out2d["y"]) == 1
        assert abs(out2d["x"][0] - 25.5) < 0.05

    def test_min_distance_z_suppresses_axial_neighbors(self):
        vol = np.zeros((11, 16, 16), np.float32)
        vol[4, 8, 8] = 10.0
        vol[6, 8, 8] = 8.0  # 2 planes away, same column
        out_tight = psf.localize_emitters_3d(
            vol, 1.0, min_distance_z=1, window=5, window_z=3
        )
        out_wide = psf.localize_emitters_3d(
            vol, 1.0, min_distance_z=2, window=5, window_z=3
        )
        assert len(out_tight["z"]) == 2
        assert len(out_wide["z"]) == 1


class TestEllipticalFit:
    def test_widths_recovered(self):
        rng = np.random.default_rng(4)
        fy, fx = np.mgrid[0:31, 0:31].astype(np.float64)
        for sy_t, sx_t in [(1.2, 2.2), (2.0, 1.1), (1.6, 1.6)]:
            cy_t = 15 + rng.uniform(-0.5, 0.5)
            cx_t = 15 + rng.uniform(-0.5, 0.5)
            img = 100 + 900 * np.exp(
                -((fy - cy_t) ** 2) / (2 * sy_t**2)
                - ((fx - cx_t) ** 2) / (2 * sx_t**2)
            )
            img += rng.normal(0, 1.0, img.shape)
            fits = psf.fit_peaks_elliptical(
                jnp.asarray(img, jnp.float32),
                jnp.asarray([[15, 15]], jnp.int32),
                window=15,
            )
            assert abs(float(fits["y"][0]) - cy_t) < 0.02
            assert abs(float(fits["x"][0]) - cx_t) < 0.02
            assert abs(float(fits["sigma_y"][0]) - sy_t) < 0.06
            assert abs(float(fits["sigma_x"][0]) - sx_t) < 0.06

    def test_width_clamped_to_bounds(self):
        # flat noise crop: widths must stay inside [min_sigma, max_sigma]
        rng = np.random.default_rng(5)
        img = rng.normal(100, 1.0, (21, 21)).astype(np.float32)
        fits = psf.fit_peaks_elliptical(
            jnp.asarray(img), jnp.asarray([[10, 10]], jnp.int32),
            window=11, min_sigma=0.5, max_sigma=6.0,
        )
        assert 0.5 <= float(fits["sigma_y"][0]) <= 6.0
        assert 0.5 <= float(fits["sigma_x"][0]) <= 6.0


class TestAstigmatism:
    def test_calibration_and_z_recovery(self):
        zs = np.linspace(-600, 600, 21)
        calib = psf.calibrate_astigmatism(_make_bead_scan(zs), zs)
        assert calib.z_range == (-600.0, 600.0)
        assert calib.window == 15
        # curve sanity: sigma_x focus above 0, sigma_y below (our setup)
        zg = np.linspace(-500, 500, 101)
        sx = np.asarray(calib.sigma_x(jnp.asarray(zg)))
        sy = np.asarray(calib.sigma_y(jnp.asarray(zg)))
        assert zg[np.argmin(sx)] > 100 and zg[np.argmin(sy)] < -100

        rng = np.random.default_rng(6)
        truth = [
            (rng.uniform(-450, 450), *rng.uniform(12, 84, 2))
            for _ in range(5)
        ]
        frame = _make_astig_frame(truth)
        out = psf.localize_emitters_astig(frame, 25.0, calib)
        assert len(out["z"]) == 5
        z_errs = []
        for cz, cy, cx in truth:
            d = (out["y"] - cy) ** 2 + (out["x"] - cx) ** 2
            i = np.argmin(d)
            assert abs(out["y"][i] - cy) < 0.05
            assert abs(out["x"][i] - cx) < 0.05
            z_errs.append(out["z"][i] - cz)
        z_rmse = float(np.sqrt(np.mean(np.square(z_errs))))
        # ~3% of the 1200-unit calibrated range on synthetic data
        assert z_rmse < 0.06 * 1200, z_errs

    def test_z_from_widths_exact_curve(self):
        zs = np.linspace(-600, 600, 21)
        calib = psf.calibrate_astigmatism(_make_bead_scan(zs), zs)
        zq = np.linspace(-500, 500, 11)
        sx = np.asarray(calib.sigma_x(jnp.asarray(zq)))
        sy = np.asarray(calib.sigma_y(jnp.asarray(zq)))
        zhat = np.asarray(psf.z_from_widths(sx, sy, calib))
        assert np.abs(zhat - zq).max() < 2.0  # grid + parabolic refine

    def test_json_roundtrip(self, tmp_path):
        calib = psf.AstigCalibration(
            qx=(1e-6, -0.005, 2.7), qy=(1e-6, 0.005, 2.7),
            z_range=(-600.0, 600.0), window=13,
        )
        p = str(tmp_path / "astig.json")
        calib.to_json(p)
        back = psf.AstigCalibration.from_json(p)
        assert back == calib

    def test_from_json_validation(self, tmp_path):
        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump({"qx": [1, 2, 3], "qy": [1, 2]}, f)
        with pytest.raises(ValueError):
            psf.AstigCalibration.from_json(p)

    def test_calibrate_validation(self):
        zs = np.linspace(-600, 600, 21)
        stack = _make_bead_scan(zs)
        with pytest.raises(ValueError, match="z positions"):
            psf.calibrate_astigmatism(stack, zs[:-1])
        with pytest.raises(ValueError, match="Z, H, W"):
            psf.calibrate_astigmatism(stack[0], zs[:1])
        with pytest.raises(ValueError, match=">= 5"):
            psf.calibrate_astigmatism(stack[:3], zs[:3])

    def test_matching_window_default(self):
        """localize_emitters_astig picks up the calibration's window."""
        zs = np.linspace(-600, 600, 15)
        calib = psf.calibrate_astigmatism(_make_bead_scan(zs), zs, window=13)
        assert calib.window == 13
        frame = _make_astig_frame([(100.0, 40.0, 40.0)])
        out = psf.localize_emitters_astig(frame, 25.0, calib)
        assert len(out["z"]) == 1
