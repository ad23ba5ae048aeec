"""Illumination correction: ops.illumination + the correct_illumination
pipeline (retrospective flat-field + photobleach compensation for plain
timelapse stacks — an extension beyond the reference's normalize-only
preprocessing; SURVEY.md L2)."""

import json
import os

import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.data.synthetic import bandlimited_scene
from sequitr_tpu.ops import illumination as illum
from sequitr_tpu.server import server as server_mod
from sequitr_tpu.server.jobs import submit_job


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def _vignette(h, w, strength=0.35):
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    return 1.0 - strength * (yy**2 + xx**2)


def _drifting_stack(T=24, H=64, W=64, rate=0.03, vig_strength=0.35, seed=0):
    """scene (shifting window) x vignette x exp bleach; returns
    (stack, truth, vig)."""
    rng = np.random.default_rng(seed)
    big = bandlimited_scene((H + T, W + T), rng, sigma=0.08, amp=50.0) + 100.0
    vig = _vignette(H, W, vig_strength)
    truth = np.stack([big[t : t + H, t : t + W] for t in range(T)])
    stack = (truth * vig[None] * np.exp(-rate * np.arange(T))[:, None, None])
    return stack.astype(np.float32), truth.astype(np.float32), vig


class TestFitShading:
    def test_recovers_vignette_shape(self):
        stack, _, vig = _drifting_stack()
        prof = illum.fit_shading(stack)
        # mean-1 convention: compare shapes after matching normalization
        want = vig / vig.mean()
        assert np.abs(prof - want).max() < 0.05

    def test_degenerate_input_returns_ones(self):
        prof = illum.fit_shading(np.zeros((4, 16, 16), np.float32))
        np.testing.assert_array_equal(prof, np.ones((16, 16), np.float32))

    def test_validation(self):
        with pytest.raises(ValueError, match="must be"):
            illum.fit_shading(np.zeros((16, 16), np.float32))
        with pytest.raises(ValueError, match="order"):
            illum.fit_shading(np.zeros((2, 8, 8), np.float32), order=0)


class TestBleachFit:
    def test_exact_exponential_recovered(self):
        t = np.arange(0, 50, 3)
        meds = 80.0 * np.exp(-0.02 * t)
        gains, rate = illum.estimate_bleach_exp(t, meds, 50)
        assert abs(rate - 0.02) < 1e-6
        np.testing.assert_allclose(
            gains, np.exp(0.02 * np.arange(50)), rtol=1e-5
        )

    def test_constant_series_is_identity(self):
        gains, rate = illum.estimate_bleach_exp(
            np.arange(10), np.full(10, 55.0), 10
        )
        assert rate == pytest.approx(0.0, abs=1e-9)
        np.testing.assert_allclose(gains, 1.0)

    def test_degenerate_inputs_fall_back_to_ones(self):
        # all-nonpositive medians: no usable samples
        gains, rate = illum.estimate_bleach_exp(
            np.arange(5), np.zeros(5), 5
        )
        assert rate == 0.0
        np.testing.assert_array_equal(gains, 1.0)
        # a single sample cannot define a slope
        gains, rate = illum.estimate_bleach_exp(
            np.array([0.0]), np.array([10.0]), 7
        )
        np.testing.assert_array_equal(gains, 1.0)

    def test_gain_clipping(self):
        # violent decay: extrapolated gains must stay bounded
        t = np.arange(4)
        gains, _ = illum.estimate_bleach_exp(t, 100.0 * np.exp(-2.0 * t), 40)
        assert gains.max() <= 20.0


class TestCorrector:
    def test_modes(self):
        frame = np.full((8, 8, 1), 40.0, np.float32)
        shading = np.full((8, 8, 1), 2.0, np.float32)
        gain = np.array([3.0], np.float32)
        ref = np.array([10.0], np.float32)
        out, med, g = illum.make_corrector("exp")(frame, shading, gain, ref)
        np.testing.assert_allclose(np.asarray(out), 60.0)  # 40/2*3
        assert float(med[0]) == pytest.approx(20.0)
        out, med, g = illum.make_corrector("ratio")(frame, shading, gain, ref)
        # shaded median 20 -> gain ref/20 = 0.5 -> 10 everywhere
        np.testing.assert_allclose(np.asarray(out), 10.0)
        assert float(g[0]) == pytest.approx(0.5)
        out, _, g = illum.make_corrector("none")(frame, shading, gain, ref)
        np.testing.assert_allclose(np.asarray(out), 20.0)
        assert float(g[0]) == 1.0

    def test_bad_mode(self):
        with pytest.raises(ValueError, match="mode"):
            illum.make_corrector("linear")

    def test_ratio_blank_reference_falls_back_to_identity(self):
        """A blank first frame (ref_med ~ 0) must mean 'no correction',
        not a stack crushed to the clip floor (review finding)."""
        frame = np.full((8, 8, 1), 100.0, np.float32)
        shading = np.ones((8, 8, 1), np.float32)
        out, _, g = illum.make_corrector("ratio")(
            frame, shading,
            np.ones(1, np.float32), np.zeros(1, np.float32),
        )
        assert float(g[0]) == 1.0
        np.testing.assert_allclose(np.asarray(out), 100.0)


class TestCorrectIlluminationPipeline:
    def _submit(self, cfg, tmp, params, inputs):
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {"module": "correct_illumination", "params": params,
             "input": inputs, "output": out},
        )
        assert server_mod.ImageServer(cfg).poll_once()
        return json.load(open(os.path.join(out, "status.json")))

    def test_exp_e2e(self, server_env):
        """Vignette + exp bleach removed: corrected stack matches the
        clean scene up to ONE global scale (the mean-1 profile keeps the
        acquired level, not the pre-vignette level)."""
        cfg, tmp = server_env
        stack, truth, _ = _drifting_stack(rate=0.03)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"bleach": "exp", "sample_frames": 16},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert abs(m["bleach_rate_c0"] - 0.03) < 0.002
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        # temporal stationarity restored
        meds = np.median(corrected, axis=(1, 2))
        assert meds.max() / meds.min() < 1.02
        # spatial structure matches truth after one global rescale
        scale = np.median(truth) / np.median(corrected)
        rel = np.abs(corrected * scale - truth) / truth
        assert float(np.percentile(rel, 99)) < 0.05
        # gains.csv: frame, gain, median rows for every frame
        gains = np.loadtxt(
            st["outputs"]["gains"], delimiter=",", skiprows=1
        )
        assert gains.shape == (stack.shape[0], 3)
        assert gains[-1, 1] == pytest.approx(
            np.exp(0.03 * (stack.shape[0] - 1)), rel=0.02
        )
        shading = tiff.read_stack(st["outputs"]["shading"])
        assert shading.shape == stack.shape[1:]

    def test_ratio_e2e(self, server_env):
        """ratio mode: every frame's median lands exactly on frame 0's."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(rate=0.05)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"bleach": "ratio"}, [str(tmp / "stack.tif")]
        )
        assert st["state"] == "complete", st.get("error")
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        meds = np.median(corrected, axis=(1, 2))
        np.testing.assert_allclose(meds, meds[0], rtol=1e-3)

    def test_multichannel(self, server_env):
        """Two channels with different bleach rates correct independently."""
        cfg, tmp = server_env
        s0, _, _ = _drifting_stack(rate=0.02, seed=1)
        s1, _, _ = _drifting_stack(rate=0.06, seed=2)
        tiff.write_stack(str(tmp / "c0.tif"), s0)
        tiff.write_stack(str(tmp / "c1.tif"), s1)
        st = self._submit(
            cfg, tmp, {"sample_frames": 16},
            [str(tmp / "c0.tif"), str(tmp / "c1.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert abs(m["bleach_rate_c0"] - 0.02) < 0.003
        assert abs(m["bleach_rate_c1"] - 0.06) < 0.003
        for key in ("corrected_c0", "corrected_c1"):
            got = tiff.read_stack(st["outputs"][key])
            meds = np.median(got, axis=(1, 2))
            assert meds.max() / meds.min() < 1.03
        shading = tiff.read_stack(st["outputs"]["shading"])
        assert shading.shape[0] == 2  # one page per channel

    def test_flatfield_off_keeps_profile_flat(self, server_env):
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack()
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"flatfield": False, "bleach": "none"},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        shading = tiff.read_stack(st["outputs"]["shading"])
        np.testing.assert_array_equal(shading, 1.0)
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        np.testing.assert_allclose(corrected, stack, rtol=1e-5)
        # pass-through jobs skip the sampling pass entirely
        m = json.loads(st["outputs"]["metrics"])
        assert m["sample_frames"] == 0

    def test_ratio_samples_only_frame_zero(self, server_env):
        """ratio + flatfield off needs ONE frame for estimation, not the
        full sample set (review finding)."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(rate=0.05)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"flatfield": False, "bleach": "ratio"},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["sample_frames"] == 1
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        meds = np.median(corrected, axis=(1, 2))
        np.testing.assert_allclose(meds, meds[0], rtol=1e-3)

    def test_frame_range(self, server_env):
        """frame_range narrows the serve; gains.csv keeps absolute
        frame indices."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(T=20)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp,
            {"bleach": "none", "flatfield": False, "frame_range": [5, 15]},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        assert corrected.shape[0] == 10
        gains = np.loadtxt(
            st["outputs"]["gains"], delimiter=",", skiprows=1
        )
        assert gains[0, 0] == 5 and gains[-1, 0] == 14

    @pytest.mark.parametrize(
        "params,msg",
        [
            ({"bleach": "linear"}, "bleach"),
            ({"dims": 3}, "2D-only"),
            ({"sample_frames": 1}, "sample_frames"),
            ({"flatfield_order": 9}, "flatfield_order"),
            ({"shading": "x.tif", "flatfield": False}, "flatfield: false"),
        ],
    )
    def test_param_validation(self, server_env, params, msg):
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(T=4)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(cfg, tmp, params, [str(tmp / "stack.tif")])
        assert st["state"] == "failed"
        assert msg in st["error"]

    def test_estimate_only(self, server_env):
        """Calibration run: shading + planned gains, no corrected stack."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(rate=0.03)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"estimate_only": True, "sample_frames": 16},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        assert "corrected" not in st["outputs"]
        assert not os.path.exists(str(tmp / "out" / "corrected.tif"))
        shading = tiff.read_stack(st["outputs"]["shading"])
        assert shading.shape == stack.shape[1:]
        gains = np.loadtxt(
            st["outputs"]["gains"], delimiter=",", skiprows=1
        )
        assert gains.shape == (stack.shape[0], 3)
        # planned exp gains cover every frame; medians only where sampled
        assert gains[-1, 1] == pytest.approx(
            np.exp(0.03 * (stack.shape[0] - 1)), rel=0.02
        )
        assert np.isnan(gains[:, 2]).sum() == stack.shape[0] - 16

    def test_shading_reuse_chain(self, server_env):
        """estimate_only -> apply with shading: <dir> via depends_on
        reproduces the single-job correction exactly."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(rate=0.03)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        cal_out = str(tmp / "cal")
        submit_job(
            cfg.jobs_dir,
            {"module": "correct_illumination",
             "params": {"estimate_only": True, "sample_frames": 16},
             "input": [str(tmp / "stack.tif")], "output": cal_out},
        )
        apply_out = str(tmp / "apply")
        submit_job(
            cfg.jobs_dir,
            {"module": "correct_illumination",
             "params": {"shading": cal_out, "sample_frames": 16},
             "input": [str(tmp / "stack.tif")], "output": apply_out,
             "depends_on": [cal_out]},
        )
        srv = server_mod.ImageServer(cfg)
        assert srv.poll_once()  # calibration
        assert srv.poll_once()  # apply (dep now complete)
        st = json.load(open(os.path.join(apply_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        # reference: the one-shot job on the same data
        one_out = str(tmp / "one")
        submit_job(
            cfg.jobs_dir,
            {"module": "correct_illumination",
             "params": {"sample_frames": 16},
             "input": [str(tmp / "stack.tif")], "output": one_out},
        )
        assert srv.poll_once()
        st1 = json.load(open(os.path.join(one_out, "status.json")))
        assert st1["state"] == "complete", st1.get("error")
        np.testing.assert_allclose(
            tiff.read_stack(st["outputs"]["corrected"]),
            tiff.read_stack(st1["outputs"]["corrected"]),
            rtol=1e-5,
        )

    def test_ratio_blank_reference_warns(self, server_env):
        """A blank first frame in ratio mode completes with gain 1 AND a
        status warning saying so (silent fallback would hide bad data)."""
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(T=6)
        stack[0] = 0.0
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        st = self._submit(
            cfg, tmp, {"flatfield": False, "bleach": "ratio"},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "complete", st.get("error")
        assert any("blank" in w for w in st.get("warnings", []))
        corrected = tiff.read_stack(st["outputs"]["corrected"])
        np.testing.assert_allclose(corrected, stack, rtol=1e-5)

    def test_shading_shape_mismatch_rejected(self, server_env):
        cfg, tmp = server_env
        stack, _, _ = _drifting_stack(T=4)
        tiff.write_stack(str(tmp / "stack.tif"), stack)
        tiff.write_stack(
            str(tmp / "prof.tif"), np.ones((16, 16), np.float32)
        )
        st = self._submit(
            cfg, tmp, {"shading": str(tmp / "prof.tif")},
            [str(tmp / "stack.tif")],
        )
        assert st["state"] == "failed"
        assert "needs" in st["error"]
