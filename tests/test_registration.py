"""Drift-correction tests: phase-correlation ops + the register_stack job.

Ops semantics under test (ops/registration.py):
  phase_correlate(ref, mov) -> (shift, response) with
  apply_shift(mov, shift) ≈ ref; register_step fuses estimate + resample
  for streaming; common_crop trims to the always-valid field of view.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.ops import registration as reg
from sequitr_tpu.server import ImageServer, submit_job


def smooth_image(shape=(64, 64), seed=0, sigma=0.08, offset=100.0):
    """Band-limited random scene: low-passed noise + a realistic DC offset
    (microscopy backgrounds are far from zero-mean)."""
    rng = np.random.default_rng(seed)
    f = np.fft.fft2(rng.normal(0, 1, shape))
    fy = np.fft.fftfreq(shape[0])[:, None]
    fx = np.fft.fftfreq(shape[1])[None, :]
    img = np.fft.ifft2(f * np.exp(-(fy**2 + fx**2) / (2 * sigma**2))).real
    return (img * 50.0 + offset).astype(np.float32)


def fourier_shifted(img, dy, dx):
    """Ground-truth sub-pixel translation (content moves by +dy/+dx)."""
    return np.asarray(reg.apply_shift(jnp.asarray(img), jnp.asarray([dy, dx])))


class TestPhaseCorrelate:
    def test_integer_shift_exact(self):
        """Broadband content, no window: the wrapped-roll case is exact."""
        rng = np.random.default_rng(1)
        img = rng.normal(0, 1, (48, 48)).astype(np.float32)
        mov = np.roll(img, (5, -3), axis=(0, 1))
        s, resp = reg.phase_correlate(
            jnp.asarray(img), jnp.asarray(mov), subpixel=False, window=False
        )
        assert np.allclose(np.asarray(s), [-5.0, 3.0])
        # and the returned shift aligns mov back onto ref
        back = np.asarray(reg.apply_shift(jnp.asarray(mov), s))
        assert np.abs(back - img).max() < 1e-3

    def test_subpixel_recovery(self):
        img = smooth_image(seed=2)
        mov = fourier_shifted(img, 2.3, -1.7)
        s, _ = reg.phase_correlate(
            jnp.asarray(img), jnp.asarray(mov), window=False
        )
        assert np.abs(np.asarray(s) - [-2.3, 1.7]).max() < 0.05
        # windowed: slightly biased but still sub-pixel
        s_w, _ = reg.phase_correlate(jnp.asarray(img), jnp.asarray(mov))
        assert np.abs(np.asarray(s_w) - [-2.3, 1.7]).max() < 0.15

    def test_refine_collapses_window_bias(self):
        """The Hann window biases the estimate in proportion to the shift
        (module docstring); refinement passes re-correlate at near-zero
        residual where the bias vanishes. Assert the measured hierarchy:
        single-pass ~0.1 px at a 10 px shift, refine=2 ~10x better,
        refine=3 ~10x better again."""
        img = smooth_image(seed=12)
        mov = fourier_shifted(img, 10.4, -5.2)
        errs = {}
        for k in (1, 2, 3):
            s, _ = reg.phase_correlate(
                jnp.asarray(img), jnp.asarray(mov), refine=k
            )
            errs[k] = np.abs(np.asarray(s) - [-10.4, 5.2]).max()
        assert errs[1] < 0.3
        assert errs[2] < errs[1] / 4
        assert errs[3] < errs[2] / 2
        assert errs[3] < 0.01

    def test_identical_frames_zero_shift(self):
        img = smooth_image(seed=3)
        s, _ = reg.phase_correlate(jnp.asarray(img), jnp.asarray(img))
        assert np.abs(np.asarray(s)).max() < 1e-3

    def test_blank_frames_no_nan(self):
        """A constant (information-free) pair must yield a finite zero
        shift, not NaN from the degenerate parabola/whitening."""
        blank = jnp.full((32, 32), 7.0)
        s, resp = reg.phase_correlate(blank, blank)
        assert np.all(np.isfinite(np.asarray(s)))
        assert np.isfinite(float(resp))

    def test_response_separates_match_from_unrelated(self):
        """Peak-to-sidelobe ratio: a genuine lock scores well above the
        response for unrelated content — the serving confidence signal."""
        img = smooth_image(seed=4)
        other = smooth_image(seed=5)
        _, r_match = reg.phase_correlate(
            jnp.asarray(img), jnp.asarray(fourier_shifted(img, 1.0, 2.0))
        )
        _, r_bad = reg.phase_correlate(jnp.asarray(img), jnp.asarray(other))
        assert float(r_match) > 1.5 * float(r_bad)

    def test_in_scene_motion(self):
        """Realistic drift: views cropped from a larger scene (content
        enters/leaves the frame — nothing wraps)."""
        big = smooth_image((160, 160), seed=6)
        ref = big[48:112, 48:112]
        mov = big[55:119, 44:108]  # true motion (7, -4)
        s, _ = reg.phase_correlate(jnp.asarray(ref), jnp.asarray(mov))
        assert np.abs(np.asarray(s) - [7.0, -4.0]).max() < 0.25


def smooth_volume(shape=(24, 48, 48), seed=0, sigma=0.10, offset=100.0):
    """Band-limited random 3D scene (z-stack analogue of smooth_image)."""
    rng = np.random.default_rng(seed)
    f = np.fft.fftn(rng.normal(0, 1, shape))
    grids = np.meshgrid(
        *[np.fft.fftfreq(n) for n in shape], indexing="ij"
    )
    r2 = sum(g**2 for g in grids)
    vol = np.fft.ifftn(f * np.exp(-r2 / (2 * sigma**2))).real
    return (vol * 50.0 + offset).astype(np.float32)


class TestVolumetric:
    """3D registration: axial (focus creep) + lateral drift in one
    estimate — per-plane 2D registration cannot see the z component."""

    def test_subpixel_recovery_3d(self):
        vol = smooth_volume(seed=21)
        mov = np.asarray(
            reg.apply_shift(jnp.asarray(vol), jnp.asarray([1.6, -2.3, 0.8]))
        )
        s, resp = reg.phase_correlate(jnp.asarray(vol), jnp.asarray(mov))
        # the short z axis (24 samples) carries proportionally more
        # window bias per pixel of shift; refine=3 collapses it
        assert np.abs(np.asarray(s) - [-1.6, 2.3, -0.8]).max() < 0.06
        assert float(resp) > 10
        s3, _ = reg.phase_correlate(
            jnp.asarray(vol), jnp.asarray(mov), refine=3
        )
        assert np.abs(np.asarray(s3) - [-1.6, 2.3, -0.8]).max() < 0.015

    def test_integer_mode_bit_exact_3d(self):
        rng = np.random.default_rng(22)
        vol = rng.normal(0, 1, (12, 20, 20)).astype(np.float32)
        mov = np.roll(vol, (3, -4, 2), axis=(0, 1, 2))
        anchor = jnp.fft.fftn(jnp.asarray(vol))
        _, cum, corr, _, _ = reg.register_step(
            anchor, jnp.asarray(mov), jnp.zeros(3),
            subpixel=False, window=False,
        )
        assert np.array_equal(np.asarray(cum), [-3.0, 4.0, -2.0])
        assert np.array_equal(np.asarray(corr), vol)

    def test_register_step_integrates_3d_drift(self):
        vol = smooth_volume(seed=23)
        anchor = jnp.fft.fftn(jnp.asarray(vol) * reg.hann_window(vol.shape))
        cum = jnp.zeros(3)
        drift = np.cumsum(
            np.random.default_rng(24).normal(0, 0.8, (4, 3)), 0
        )
        for t in range(4):
            mov = np.asarray(
                reg.apply_shift(jnp.asarray(vol), jnp.asarray(drift[t]))
            )
            anchor, cum, corr, _, _ = reg.register_step(
                anchor, jnp.asarray(mov), cum
            )
            assert np.abs(np.asarray(cum) + drift[t]).max() < 0.1 * (t + 1)
            assert np.abs(np.asarray(corr) - vol).mean() < 0.5

    def test_common_crop_3d(self):
        zs, ys, xs = reg.common_crop(
            np.array([[0.0, 0.0, 0.0], [1.5, -2.0, 3.0]]), (16, 32, 32)
        )
        assert (zs.start, zs.stop) == (2, 16)
        assert (ys.start, ys.stop) == (0, 30)
        assert (xs.start, xs.stop) == (3, 32)


class TestVolumeSequence:
    def test_sequence_roundtrip_and_select(self, tmp_path):
        from sequitr_tpu.data.source import VolumeSequence

        rng = np.random.default_rng(30)
        vols = [
            (rng.random((5, 8, 8)) * 900).astype(np.uint16) for _ in range(4)
        ]
        from sequitr_tpu.data import tiff as tiff_lib

        d = tmp_path / "vols"
        d.mkdir()
        for i, v in enumerate(vols):
            tiff_lib.write_stack(str(d / f"t_{i}.tif"), v)
        with VolumeSequence(str(d)) as seq:
            assert len(seq) == 4
            assert seq.spatial == (5, 8, 8)
            assert seq.dtype == np.uint16
            for t in range(4):
                np.testing.assert_array_equal(seq.volume(t), vols[t])
            seq.select(1, 3)
            assert len(seq) == 2 and seq.frame_offset == 1
            np.testing.assert_array_equal(seq.volume(0), vols[1])

    def test_rejects_2d_and_mismatched(self, tmp_path):
        from sequitr_tpu.data import tiff as tiff_lib
        from sequitr_tpu.data.source import VolumeSequence

        d = tmp_path / "vols"
        d.mkdir()
        tiff_lib.write_stack(
            str(d / "t_0.tif"), np.zeros((4, 8, 8), np.uint16)
        )
        tiff_lib.write_stack(
            str(d / "t_1.tif"), np.zeros((3, 8, 8), np.uint16)
        )
        # mismatches surface at INIT (header-only scan), inside the
        # pipeline's deterministic-JobError wrapper — never hours into
        # a streaming pass
        with pytest.raises(ValueError, match="differs"):
            VolumeSequence(str(d))
        tiff_lib.write_stack(
            str(tmp_path / "flat.tif"), np.zeros((8, 8), np.float32)
        )
        with pytest.raises(ValueError, match="volume"):
            VolumeSequence(str(tmp_path / "flat.tif"))


class TestApplyShift:
    def test_round_trip(self):
        img = smooth_image(seed=7)
        out = reg.apply_shift(
            reg.apply_shift(jnp.asarray(img), jnp.asarray([1.3, -2.6])),
            jnp.asarray([-1.3, 2.6]),
        )
        assert np.abs(np.asarray(out) - img).max() < 1e-3

    def test_integer_shift_matches_roll(self):
        img = smooth_image(seed=8)
        out = np.asarray(reg.apply_shift(jnp.asarray(img), jnp.asarray([3.0, -2.0])))
        assert np.abs(out - np.roll(img, (3, -2), axis=(0, 1))).max() < 1e-3


class TestRegisterStep:
    def _drifted(self, img, drift):
        return [fourier_shifted(img, d[0], d[1]) for d in drift]

    def test_previous_mode_integrates_drift(self):
        img = smooth_image(seed=9)
        drift = np.cumsum(np.random.default_rng(10).normal(0, 1.5, (5, 2)), 0)
        anchor = jnp.fft.fft2(jnp.asarray(img) * reg.hann2d(img.shape))
        cum = jnp.zeros(2)
        for t, fr in enumerate(self._drifted(img, drift)):
            anchor, cum, corr, step, resp = reg.register_step(
                anchor, jnp.asarray(fr), cum
            )
            # cumulative estimate tracks -drift within per-step error budget
            assert np.abs(np.asarray(cum) + drift[t]).max() < 0.12 * (t + 1)
            # the corrected frame lands back on the original scene
            assert np.abs(np.asarray(corr) - img).mean() < 0.3

    def test_first_mode_no_accumulation(self):
        """Reference mode: cum input stays zero, every frame correlates
        against frame 0's spectrum — per-frame error doesn't compound."""
        img = smooth_image(seed=11)
        anchor0 = jnp.fft.fft2(jnp.asarray(img) * reg.hann2d(img.shape))
        zero = jnp.zeros(2)
        for dy, dx in [(4.2, -3.1), (-7.6, 5.5)]:
            _, cum, corr, step, _ = reg.register_step(
                anchor0, jnp.asarray(fourier_shifted(img, dy, dx)), zero
            )
            # windowed bias grows with shift magnitude; still sub-half-px,
            # and the intensity residual scales with it (~1% of range here)
            assert np.abs(np.asarray(cum) - [-dy, -dx]).max() < 0.3
            assert np.abs(np.asarray(corr) - img).mean() < 1.0

    def test_resample_false_skips_corrected(self):
        """Estimation-only callers compile the resample out of the graph;
        shifts are identical to the resampling step's."""
        img = smooth_image(seed=13)
        mov = fourier_shifted(img, 3.4, -2.2)
        anchor = jnp.fft.fft2(jnp.asarray(img) * reg.hann2d(img.shape))
        _, cum_a, corr, _, _ = reg.register_step(
            anchor, jnp.asarray(mov), jnp.zeros(2)
        )
        _, cum_b, none, _, _ = reg.register_step(
            anchor, jnp.asarray(mov), jnp.zeros(2), resample=False
        )
        assert none is None
        assert corr is not None
        assert np.array_equal(np.asarray(cum_a), np.asarray(cum_b))

    def test_integer_mode_bit_exact(self):
        rng = np.random.default_rng(12)
        img = rng.normal(0, 1, (40, 40)).astype(np.float32)
        mov = np.roll(img, (6, -2), axis=(0, 1))
        anchor = jnp.fft.fft2(jnp.asarray(img))
        _, cum, corr, _, _ = reg.register_step(
            anchor, jnp.asarray(mov), jnp.zeros(2), subpixel=False, window=False
        )
        assert np.array_equal(np.asarray(cum), [-6.0, 2.0])
        assert np.array_equal(np.asarray(corr), img)


class TestCommonCrop:
    def test_trims_extremes(self):
        ys, xs = reg.common_crop(
            np.array([[0.0, 0.0], [3.2, -1.5], [-2.0, 4.0]]), (32, 32)
        )
        assert (ys.start, ys.stop) == (4, 30)
        assert (xs.start, xs.stop) == (4, 30)  # floor(-1.5) trims 2

    def test_rejects_total_drift(self):
        with pytest.raises(ValueError, match="drift exceeds"):
            reg.common_crop(np.array([[0.0, 0.0], [40.0, 0.0]]), (32, 32))


class TestUnwrapTrajectory:
    def test_recovers_wrapped_first_mode_drift(self):
        """Estimates are canonical in (-N/2, N/2]; a monotonic drift past
        half the frame wraps to the opposite sign (true -36 on a 64 px
        axis reports as +28) and a wrapped trajectory would make
        common_crop select exactly the stale region. Unwrapping restores
        the physical trajectory from continuity."""
        img = smooth_image((64, 64), seed=14)
        true = [(0.0, 0.0), (-9.0, 2.0), (-18.0, 4.0), (-27.0, 6.0), (-36.0, 8.0)]
        est = []
        for dy, dx in true:
            s, _ = reg.phase_correlate(
                jnp.asarray(img), jnp.asarray(fourier_shifted(img, -dy, -dx))
            )
            est.append(np.asarray(s))
        est = np.stack(est)
        # the last estimate is wrapped: ~+28, not -36
        assert est[-1][0] > 20
        unwrapped = reg.unwrap_trajectory(est, (64, 64))
        assert np.abs(unwrapped - np.asarray(true)).max() < 0.15
        # and the crop computed from it selects the VALID leading rows
        ys, xs = reg.common_crop(unwrapped, (64, 64))
        assert ys.start == 0 and ys.stop <= 64 - 36
        # wrapped trajectory is a no-op case for already-continuous input
        cont = np.array([[0.0, 0.0], [3.0, -1.0], [5.5, -2.0]])
        assert np.array_equal(reg.unwrap_trajectory(cont, (64, 64)), cont)


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def run_job(cfg, out_dir):
    assert ImageServer(cfg).poll_once()
    status = json.load(open(os.path.join(out_dir, "status.json")))
    return status


class TestRegisterStackPipeline:
    def _write_drifting_stack(self, path, drift, seed=0, size=48):
        """Integer-roll drift: correction can be verified bit-exactly."""
        img = smooth_image((size, size), seed=seed)
        frames = [np.roll(img, (int(d[0]), int(d[1])), (0, 1)) for d in drift]
        tiff.write_stack(path, np.stack(frames))
        return img

    def test_integer_mode_recovers_exactly(self, server_env):
        cfg, tmp = server_env
        drift = [(0, 0), (3, -2), (5, 1), (-4, 6)]
        img = self._write_drifting_stack(str(tmp / "stack.tif"), drift)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"subpixel": False, "window": False},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        got = tiff.read_stack(status["outputs"]["registered"])
        assert got.dtype == np.float32  # input dtype preserved (float32 in)
        for t in range(len(drift)):
            np.testing.assert_array_equal(got[t], img)
        # shifts.csv: cumulative = -drift, exactly
        rows = open(status["outputs"]["shifts"]).read().strip().splitlines()
        assert rows[0] == "frame,dy,dx,step_dy,step_dx,response"
        assert len(rows) == 1 + len(drift)
        for t, line in enumerate(rows[1:]):
            vals = line.split(",")
            assert int(vals[0]) == t
            assert float(vals[1]) == -drift[t][0]
            assert float(vals[2]) == -drift[t][1]
        metrics = json.loads(status["outputs"]["metrics"])
        assert metrics["n_frames"] == len(drift)
        assert metrics["max_drift_px"] == pytest.approx(
            max(np.hypot(d[0], d[1]) for d in drift), abs=1e-3  # metric is rounded
        )

    def test_subpixel_crop_mode(self, server_env):
        cfg, tmp = server_env
        img = smooth_image((48, 48), seed=3)
        drift = np.array([[0.0, 0.0], [2.4, -1.6], [4.1, 2.3]])
        frames = [fourier_shifted(img, d[0], d[1]) for d in drift]
        tiff.write_stack(str(tmp / "stack.tif"), np.stack(frames))
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"crop": True},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        got = tiff.read_stack(status["outputs"]["registered"])
        # cropped to the common field of view: strictly smaller than input
        assert got.shape[0] == 3
        assert got.shape[1] < 48 and got.shape[2] < 48
        # every registered frame matches frame 0's crop closely
        for t in range(3):
            assert np.abs(got[t] - got[0]).mean() < 0.5

    def test_estimate_only(self, server_env):
        cfg, tmp = server_env
        self._write_drifting_stack(str(tmp / "stack.tif"), [(0, 0), (2, 2)])
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"estimate_only": True},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        assert "registered" not in status["outputs"]
        assert not os.path.exists(os.path.join(out, "registered.tif"))
        assert os.path.exists(status["outputs"]["shifts"])

    def test_multichannel_shifts_from_first_channel(self, server_env):
        """Channel 1 rides channel 0's trajectory — the two stay aligned."""
        cfg, tmp = server_env
        drift = [(0, 0), (4, -3)]
        img0 = self._write_drifting_stack(str(tmp / "c0.tif"), drift, seed=5)
        img1 = self._write_drifting_stack(str(tmp / "c1.tif"), drift, seed=6)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"subpixel": False, "window": False},
                "input": [str(tmp / "c0.tif"), str(tmp / "c1.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        got0 = tiff.read_stack(status["outputs"]["registered_c0"])
        got1 = tiff.read_stack(status["outputs"]["registered_c1"])
        for t in range(len(drift)):
            np.testing.assert_array_equal(got0[t], img0)
            np.testing.assert_array_equal(got1[t], img1)

    def test_uint16_integer_mode_preserves_dtype(self, server_env):
        cfg, tmp = server_env
        rng = np.random.default_rng(7)
        img = (rng.random((32, 32)) * 60000).astype(np.uint16)
        frames = np.stack([img, np.roll(img, (5, -4), (0, 1))])
        tiff.write_stack(str(tmp / "stack.tif"), frames)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"subpixel": False, "window": False},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        got = tiff.read_stack(status["outputs"]["registered"])
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got[1], img)

    def test_bad_mode_fails_fast(self, server_env):
        cfg, tmp = server_env
        self._write_drifting_stack(str(tmp / "stack.tif"), [(0, 0)])
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"mode": "sideways"},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "sideways" in status["error"]


class TestRegisterVolumesPipeline:
    """dims=3: volumetric registration of a timelapse of z-stack files."""

    def _write_drifting_volumes(self, d, drift, seed=31, shape=(12, 24, 24)):
        """One (Z, H, W) file per timepoint, Fourier-drifted in 3D."""
        vol = smooth_volume(shape, seed=seed)
        os.makedirs(d, exist_ok=True)
        for t, s in enumerate(drift):
            moved = np.asarray(
                reg.apply_shift(jnp.asarray(vol), jnp.asarray(s, jnp.float32))
            )
            tiff.write_stack(os.path.join(d, f"t_{t}.tif"), moved)
        return vol

    def test_volumetric_crop_registration(self, server_env):
        cfg, tmp = server_env
        drift = [(0.0, 0.0, 0.0), (0.8, -1.2, 0.6), (1.6, -2.4, 1.2)]
        d = str(tmp / "vols")
        self._write_drifting_volumes(d, drift)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                # refine=3: the tiny 12-px z axis carries proportionally
                # more window bias (see TestVolumetric), the third pass
                # collapses it
                "params": {"dims": 3, "crop": True, "refine": 3},
                "input": [d],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        vols = [
            tiff.read_stack(os.path.join(out, f"registered_t{t:04d}.tif"))
            for t in range(3)
        ]
        # cropped to the common region, all axes trimmed
        assert vols[0].ndim == 3 and vols[0].shape < (12, 24, 24)
        span = vols[0].max() - vols[0].min()
        for v in vols[1:]:
            assert v.shape == vols[0].shape
            # tiny 12-px z axis: residual bias is worst-case ~2% at a
            # few sharp voxels; the field as a whole is stationary
            assert np.abs(v - vols[0]).mean() < 0.005 * span
            assert np.abs(v - vols[0]).max() < 0.04 * span
        # shifts.csv has the 3-axis schema with a z column
        header = open(os.path.join(out, "shifts.csv")).readline().strip()
        assert header == "frame,dz,dy,dx,step_dz,step_dy,step_dx,response"
        rows = np.loadtxt(
            os.path.join(out, "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2, 3),
        )
        # z bias scales with shift/N and the z axis is only 12 samples;
        # lateral axes land within a few hundredths of a pixel
        assert np.abs(rows[-1] - [-1.6, 2.4, -1.2]).max() < 0.12
        assert np.abs(rows[-1][1:] - [2.4, -1.2]).max() < 0.04
        metrics = json.loads(status["outputs"]["metrics"])
        assert metrics["n_volumes"] == 3

    def test_volumetric_integer_multichannel(self, server_env):
        """Integer-roll drift on two channels: correction is bit-exact and
        keeps the native dtype; channel 1 rides channel 0's trajectory."""
        cfg, tmp = server_env
        rng = np.random.default_rng(32)
        base0 = (rng.random((6, 16, 16)) * 900).astype(np.uint16)
        base1 = (rng.random((6, 16, 16)) * 900).astype(np.uint16)
        drift = [(0, 0, 0), (2, -3, 1), (1, 4, -2)]
        d0, d1 = str(tmp / "c0"), str(tmp / "c1")
        os.makedirs(d0), os.makedirs(d1)
        for t, s in enumerate(drift):
            for d, b in ((d0, base0), (d1, base1)):
                tiff.write_stack(
                    os.path.join(d, f"t_{t}.tif"),
                    np.roll(b, s, axis=(0, 1, 2)),
                )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"dims": 3, "subpixel": False, "window": False},
                "input": [d0, d1],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        for t in range(3):
            for c, b in ((0, base0), (1, base1)):
                got = tiff.read_stack(
                    os.path.join(out, f"registered_t{t:04d}_c{c}.tif")
                )
                assert got.dtype == np.uint16
                np.testing.assert_array_equal(got, b)

    def test_glob_input_and_compress(self, server_env):
        """Glob entries pass _resolve_inputs (the documented convention)
        and compress_output is honored for volume outputs."""
        cfg, tmp = server_env
        drift = [(0, 0, 0), (1, -2, 1)]
        d = str(tmp / "vols")
        os.makedirs(d)
        # sparse label-like volume: the documented compress_output case
        base = np.zeros((4, 16, 16), np.uint16)
        base[1, 4:8, 4:8] = 7
        base[2, 9:12, 2:5] = 9
        for t, s in enumerate(drift):
            tiff.write_stack(
                os.path.join(d, f"t_{t}.tif"), np.roll(base, s, (0, 1, 2))
            )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {
                    "dims": 3,
                    "subpixel": False,
                    "window": False,
                    "compress_output": True,
                },
                "input": [os.path.join(d, "t_*.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        for t in range(2):
            got = tiff.read_stack(
                os.path.join(out, f"registered_t{t:04d}.tif")
            )
            np.testing.assert_array_equal(got, base)
        # deflate output: sparse labels shrink well below raw size
        raw = base.nbytes
        assert (
            os.path.getsize(os.path.join(out, "registered_t0000.tif"))
            < raw / 2
        )

    def test_volumetric_needs_sequence(self, server_env):
        cfg, tmp = server_env
        tiff.write_stack(
            str(tmp / "one.tif"), np.zeros((4, 8, 8), np.float32)
        )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"dims": 3},
                "input": [str(tmp / "one.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "timepoints" in status["error"]


class TestRegisterBatchDP:
    """First-frame-mode batched/DP registration: every frame correlates
    against the same reference, so estimation shards over the mesh with
    zero inter-chip traffic. Virtual 8-device mesh (conftest)."""

    def _drifting(self, n=8, size=64, seed=40):
        img = smooth_image((size, size), seed=seed)
        truth = np.cumsum(
            np.random.default_rng(seed + 1).normal(0, 1.0, (n, 2)), 0
        )
        truth[0] = 0.0
        frames = np.stack(
            [fourier_shifted(img, d[0], d[1]) for d in truth]
        )
        return img, frames, truth

    def test_batch_matches_streaming_first_mode(self):
        img, frames, _ = self._drifting()
        # streaming first-mode reference
        anchor = jnp.fft.fftn(jnp.asarray(frames[0]) * reg.hann_window(img.shape))
        zero = jnp.zeros(2)
        stream = []
        for f in frames:
            _, cum, corr, _, _ = reg.register_step(
                anchor, jnp.asarray(f), zero
            )
            stream.append((np.asarray(cum), np.asarray(corr)))
        shifts, resps, corrs = reg.register_batch(
            jnp.asarray(frames[0]), jnp.asarray(frames)
        )
        for t in range(len(frames)):
            assert np.abs(np.asarray(shifts)[t] - stream[t][0]).max() < 1e-4
            assert np.abs(np.asarray(corrs)[t] - stream[t][1]).max() < 1e-3
        assert np.all(np.asarray(resps)[1:] > 5)

    def test_dp_sharded_matches_unsharded(self):
        import jax

        from sequitr_tpu import parallel

        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        img, frames, _ = self._drifting(n=8)
        mesh = parallel.make_mesh()
        dp = parallel.make_dp_registerer(mesh)
        s_dp, r_dp, c_dp = dp(jnp.asarray(frames[0]), jnp.asarray(frames))
        s_1, r_1, c_1 = reg.register_batch(
            jnp.asarray(frames[0]), jnp.asarray(frames)
        )
        np.testing.assert_allclose(
            np.asarray(s_dp), np.asarray(s_1), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_dp), np.asarray(c_1), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(r_dp), np.asarray(r_1), rtol=1e-4
        )

    def test_pipeline_dp_matches_streaming(self, server_env):
        """register_stack with data_parallel=true produces the same
        registered stack and trajectory as the single-chip streaming
        run (first mode)."""
        import jax

        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg, tmp = server_env
        img, frames, _ = self._drifting(n=10, size=48, seed=41)
        tiff.write_stack(str(tmp / "stack.tif"), frames)
        outs = {}
        for name, extra in (
            ("dp", {"data_parallel": True}),
            ("single", {}),
        ):
            out = str(tmp / name)
            submit_job(
                cfg.jobs_dir,
                {
                    "module": "register_stack",
                    "params": dict({"mode": "first"}, **extra),
                    "input": [str(tmp / "stack.tif")],
                    "output": out,
                },
            )
            status = run_job(cfg, out)
            assert status["state"] == "complete", status.get("error")
            outs[name] = out
        a = tiff.read_stack(os.path.join(outs["dp"], "registered.tif"))
        b = tiff.read_stack(os.path.join(outs["single"], "registered.tif"))
        assert np.abs(a - b).max() < 1e-3
        sa = np.loadtxt(
            os.path.join(outs["dp"], "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2),
        )
        sb = np.loadtxt(
            os.path.join(outs["single"], "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2),
        )
        assert np.abs(sa - sb).max() < 1e-3

    def test_pipeline_frame_batch_matches_streaming(self, server_env):
        """frame_batch > 1 (single chip, first mode) batches the
        correlation per dispatch; outputs identical to streaming (10
        frames / batch 4: tail padding exercised). Composes with
        data_parallel on the virtual mesh."""
        cfg, tmp = server_env
        img, frames, _ = self._drifting(n=10, size=48, seed=43)
        tiff.write_stack(str(tmp / "fb_stack.tif"), frames)
        import jax

        cases = [("fb", {"frame_batch": 4}), ("single", {})]
        if jax.device_count() >= 2:
            cases.append(
                ("fbdp", {"frame_batch": 2, "data_parallel": True})
            )
        outs = {}
        for name, extra in cases:
            out = str(tmp / f"fbp_{name}")
            submit_job(
                cfg.jobs_dir,
                {
                    "module": "register_stack",
                    "params": dict({"mode": "first"}, **extra),
                    "input": [str(tmp / "fb_stack.tif")],
                    "output": out,
                },
            )
            status = run_job(cfg, out)
            assert status["state"] == "complete", status.get("error")
            outs[name] = status
        base = tiff.read_stack(
            os.path.join(str(tmp / "fbp_single"), "registered.tif")
        )
        for name, _ in cases[:1] + cases[2:]:
            got = tiff.read_stack(
                os.path.join(str(tmp / f"fbp_{name}"), "registered.tif")
            )
            assert np.abs(got - base).max() < 1e-3, name
        m = json.loads(outs["fb"]["outputs"]["metrics"])
        assert m["frame_batch"] == 4

    def test_frame_batch_rejects_previous_mode(self, server_env):
        cfg, tmp = server_env
        tiff.write_stack(
            str(tmp / "fbr.tif"), np.zeros((3, 16, 16), np.float32)
        )
        out = str(tmp / "fbr_out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"frame_batch": 4, "mode": "previous"},
                "input": [str(tmp / "fbr.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "serial" in status["error"]

    def test_estimate_roi_matches_full_estimation(self, server_env):
        """estimate_roi: drift estimated from a subregion, FULL frames
        resampled — byte-identical to whole-frame estimation in integer
        mode on content-rich scenes; shifts.csv agrees."""
        cfg, tmp = server_env
        rng = np.random.default_rng(47)
        img = smooth_image((64, 64), seed=47)
        truth = np.cumsum(rng.integers(-2, 3, (6, 2)), 0)
        truth[0] = 0
        frames = np.stack(
            [np.roll(img, tuple(d), axis=(0, 1)) for d in truth]
        )
        tiff.write_stack(str(tmp / "er_stack.tif"), frames)
        outs = {}
        for name, extra in (
            ("roi", {"estimate_roi": [8, 8, 56, 56]}),
            ("full", {}),
        ):
            out = str(tmp / f"er_{name}")
            submit_job(
                cfg.jobs_dir,
                {
                    "module": "register_stack",
                    "params": dict({"subpixel": False}, **extra),
                    "input": [str(tmp / "er_stack.tif")],
                    "output": out,
                },
            )
            status = run_job(cfg, out)
            assert status["state"] == "complete", status.get("error")
            outs[name] = out
        a = tiff.read_stack(os.path.join(outs["roi"], "registered.tif"))
        b = tiff.read_stack(os.path.join(outs["full"], "registered.tif"))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # output frames are FULL size, not the roi
        assert np.asarray(a).shape[1:] == (64, 64)
        sa = np.loadtxt(
            os.path.join(outs["roi"], "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2),
        )
        sb = np.loadtxt(
            os.path.join(outs["full"], "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2),
        )
        np.testing.assert_allclose(sa, sb, atol=0.2)

    def test_plain_roi_rejected(self, server_env):
        cfg, tmp = server_env
        tiff.write_stack(
            str(tmp / "pr.tif"), np.zeros((3, 32, 32), np.float32)
        )
        out = str(tmp / "pr_out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"roi": [0, 0, 16, 16]},
                "input": [str(tmp / "pr.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "estimate_roi" in status["error"]

    def test_estimate_roi_rejected_for_volumes(self, server_env):
        cfg, tmp = server_env
        d = tmp / "er3d"
        d.mkdir()
        tiff.write_stack(
            str(d / "t_0.tif"), np.zeros((4, 16, 16), np.float32)
        )
        out = str(tmp / "er3d_out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"dims": 3, "estimate_roi": [0, 0, 8, 8]},
                "input": [str(d)],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "2D-only" in status["error"]

    def test_frame_batch_rejected_for_volumes(self, server_env):
        cfg, tmp = server_env
        d = tmp / "fb3d"
        d.mkdir()
        tiff.write_stack(
            str(d / "t_0.tif"), np.zeros((4, 16, 16), np.float32)
        )
        out = str(tmp / "fb3d_out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"dims": 3, "mode": "first", "frame_batch": 8},
                "input": [str(d)],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "2D-only" in status["error"]

    def test_dp_rejects_previous_mode(self, server_env):
        cfg, tmp = server_env
        tiff.write_stack(
            str(tmp / "s.tif"), np.zeros((3, 16, 16), np.float32)
        )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"data_parallel": True, "mode": "previous"},
                "input": [str(tmp / "s.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "serial" in status["error"]


class TestSingleFileVolumeTimelapse:
    """z param: one TIFF of T*Z pages (flattened hyperstack) served as a
    volume timelapse."""

    def test_volume_sequence_z_mode(self, tmp_path):
        from sequitr_tpu.data.source import VolumeSequence

        rng = np.random.default_rng(50)
        vols = [(rng.random((4, 8, 8)) * 900).astype(np.uint16) for _ in range(3)]
        flat = np.concatenate(vols, axis=0)  # (12, 8, 8) pages
        tiff.write_stack(str(tmp_path / "hyper.tif"), flat)
        with VolumeSequence(str(tmp_path / "hyper.tif"), z=4) as seq:
            assert len(seq) == 3
            assert seq.spatial == (4, 8, 8)
            assert seq.dtype == np.uint16
            for t in range(3):
                np.testing.assert_array_equal(seq.volume(t), vols[t])
            seq.select(1, 3)
            np.testing.assert_array_equal(seq.volume(0), vols[1])
        with pytest.raises(ValueError, match="divide"):
            VolumeSequence(str(tmp_path / "hyper.tif"), z=5)

    def test_register_stack_z_mode(self, server_env):
        cfg, tmp = server_env
        rng = np.random.default_rng(51)
        base = (rng.random((6, 24, 24)) * 900).astype(np.uint16)
        drift = [(0, 0, 0), (1, -2, 1), (2, 3, -1)]
        flat = np.concatenate(
            [np.roll(base, s, axis=(0, 1, 2)) for s in drift], axis=0
        )
        tiff.write_stack(str(tmp / "hyper.tif"), flat)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {
                    "dims": 3, "z": 6, "subpixel": False, "window": False,
                },
                "input": [str(tmp / "hyper.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        for t in range(3):
            got = tiff.read_stack(
                os.path.join(out, f"registered_t{t:04d}.tif")
            )
            assert got.dtype == np.uint16
            np.testing.assert_array_equal(got, base)


class TestAlignChannels:
    def test_chromatic_offset_corrected(self, server_env):
        """Two channels of the same scene, channel 1 carrying a constant
        (2.0, -1.5) px chromatic offset on top of the shared stage
        drift: align_channels folds the offset into the resample, so the
        registered channels coincide AND are stationary."""
        cfg, tmp = server_env
        img = smooth_image((64, 64), seed=60)
        offset = np.asarray([2.0, -1.5], np.float32)
        c0, c1 = [], []
        for t in range(5):
            drift = np.asarray([0.7 * t, -0.4 * t], np.float32)
            c0.append(fourier_shifted(img, *drift))
            c1.append(fourier_shifted(img, *(drift + offset)))
        tiff.write_stack(str(tmp / "c0.tif"), np.stack(c0))
        tiff.write_stack(str(tmp / "c1.tif"), np.stack(c1))
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"align_channels": True, "crop": True,
                           "refine": 3},
                "input": [str(tmp / "c0.tif"), str(tmp / "c1.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        metrics = json.loads(status["outputs"]["metrics"])
        est_off = np.asarray(metrics["chromatic_offsets_px"][1])
        # the estimated chromatic offset is the ALIGNING shift (-offset)
        assert np.abs(est_off + offset).max() < 0.02, est_off
        r0 = tiff.read_stack(os.path.join(out, "registered_c0.tif"))
        r1 = tiff.read_stack(os.path.join(out, "registered_c1.tif"))
        span = r0[0].max() - r0[0].min()
        # channels coincide after alignment...
        assert np.abs(r1 - r0).max() < 0.02 * span
        # ...and the stack is stationary
        assert max(
            float(np.abs(r0[t] - r0[0]).max()) for t in range(5)
        ) < 0.02 * span

    def test_align_channels_needs_multichannel(self, server_env):
        cfg, tmp = server_env
        tiff.write_stack(
            str(tmp / "s.tif"), np.zeros((3, 16, 16), np.float32)
        )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"align_channels": True},
                "input": [str(tmp / "s.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "failed"
        assert "2 input channels" in status["error"]


class TestMinResponseGate:
    def test_blank_frame_does_not_derail_trajectory(self, server_env):
        """previous mode with a BLANK frame mid-stack: ungated, the bogus
        step poisons every later frame; with min_response the trajectory
        holds, the anchor skips the bad frame, and later frames register
        correctly. The rejection is visible in metrics + shifts.csv."""
        cfg, tmp = server_env
        img = smooth_image((64, 64), seed=70)
        frames = []
        for t in range(6):
            if t == 3:
                frames.append(np.zeros((64, 64), np.float32))  # shutter drop
            else:
                frames.append(fourier_shifted(img, 1.0 * t, -0.6 * t))
        tiff.write_stack(str(tmp / "stack.tif"), np.stack(frames))
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"min_response": 8.0, "estimate_only": True},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        metrics = json.loads(status["outputs"]["metrics"])
        assert metrics["n_low_confidence"] == 1
        # genfromtxt: row 0's response column is empty (reference frame)
        rows = np.genfromtxt(
            os.path.join(out, "shifts.csv"),
            delimiter=",", skip_header=1, usecols=(1, 2, 5),
        )
        # the blank frame held the last accepted shift...
        np.testing.assert_allclose(rows[3, :2], rows[2, :2])
        assert rows[3, 2] < 8.0  # ...with its low response on record
        # ...and frames AFTER it recovered the true trajectory: the
        # anchor skipped the blank, so frame 4 correlates frame 2's
        # content (two steps of drift in one estimate)
        assert np.abs(rows[5, :2] - [-5.0, 3.0]).max() < 0.15

    def test_first_mode_dp_gate(self, server_env):
        """The gate in the data-parallel estimator: rejected frames hold
        the last accepted estimate, accepted ones are unaffected."""
        import jax

        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg, tmp = server_env
        img = smooth_image((48, 48), seed=71)
        frames = [fourier_shifted(img, 0.8 * t, 0.5 * t) for t in range(5)]
        frames[2] = np.zeros((48, 48), np.float32)
        tiff.write_stack(str(tmp / "stack.tif"), np.stack(frames))
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"mode": "first", "data_parallel": True,
                           "min_response": 8.0, "estimate_only": True},
                "input": [str(tmp / "stack.tif")],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        assert json.loads(status["outputs"]["metrics"])[
            "n_low_confidence"
        ] == 1
        rows = np.loadtxt(
            os.path.join(out, "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2),
        )
        np.testing.assert_allclose(rows[2], rows[1])  # held
        assert np.abs(rows[4] - [-3.2, -2.0]).max() < 0.05  # unaffected


class TestAlignChannels3D:
    def test_volumetric_chromatic_offset(self, server_env):
        """dims=3 align_channels: channel 1 carries a constant
        (1, -2, 1) voxel offset (incl. AXIAL) on top of shared drift;
        integer mode recovers both bit-exactly."""
        cfg, tmp = server_env
        rng = np.random.default_rng(80)
        base0 = (rng.random((6, 20, 20)) * 900).astype(np.uint16)
        # channels must SHARE structure for cross-channel correlation
        # (real chromatic calibration uses beads/transmitted light);
        # an intensity transform of the same scene models that
        base1 = (base0 // 2 + 30).astype(np.uint16)
        off = (1, -2, 1)
        d0, d1 = str(tmp / "c0"), str(tmp / "c1")
        os.makedirs(d0), os.makedirs(d1)
        for t, s in enumerate([(0, 0, 0), (2, -1, 1), (1, 3, -2)]):
            tiff.write_stack(
                os.path.join(d0, f"t_{t}.tif"), np.roll(base0, s, (0, 1, 2))
            )
            tiff.write_stack(
                os.path.join(d1, f"t_{t}.tif"),
                np.roll(
                    base1,
                    tuple(a + b for a, b in zip(s, off)),
                    (0, 1, 2),
                ),
            )
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {
                    "dims": 3, "subpixel": False, "window": False,
                    "align_channels": True,
                },
                "input": [d0, d1],
                "output": out,
            },
        )
        status = run_job(cfg, out)
        assert status["state"] == "complete", status.get("error")
        metrics = json.loads(status["outputs"]["metrics"])
        est = np.asarray(metrics["chromatic_offsets_px"][1])
        np.testing.assert_allclose(est, [-1.0, 2.0, -1.0])  # aligning
        for t in range(3):
            for c, b in ((0, base0), (1, base1)):
                got = tiff.read_stack(
                    os.path.join(out, f"registered_t{t:04d}_c{c}.tif")
                )
                np.testing.assert_array_equal(got, b)
