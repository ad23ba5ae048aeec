"""Tests: per-frame acquisition QC (ops/qc.py + the qc_stack pipeline).

Focus/exposure/saturation triage before any model runs — an extension
beyond the reference (whose era triaged acquisitions by eye).
"""

import json
import os

import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.ops import qc as qc_lib
from sequitr_tpu.server import ImageServer, submit_job


def _scene(rng, size=64, blur=0):
    """A textured scene; ``blur`` box-filters it (defocus stand-in)."""
    img = rng.random((size, size)).astype(np.float32) * 100
    for _ in range(blur):
        img = (
            img
            + np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 5.0
    return img


class TestFrameQC:
    def test_focus_measures_order_by_sharpness(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        qc = qc_lib.make_frame_qc()
        inf = jnp.asarray(np.inf, jnp.float32)
        sharp = np.asarray(qc(jnp.asarray(_scene(rng)), inf))
        soft = np.asarray(qc(jnp.asarray(_scene(rng, blur=2)), inf))
        very = np.asarray(qc(jnp.asarray(_scene(rng, blur=6)), inf))
        i_vol = qc_lib.METRICS.index("focus_vol")
        i_ten = qc_lib.METRICS.index("tenengrad")
        for i in (i_vol, i_ten):
            assert sharp[i] > soft[i] > very[i]

    def test_saturation_and_exposure_exact(self):
        import jax.numpy as jnp

        img = np.full((32, 32), 100.0, np.float32)
        img[:8] = 255.0  # exactly 1/4 saturated
        qc = qc_lib.make_frame_qc()
        got = np.asarray(qc(jnp.asarray(img), jnp.asarray(255.0)))
        m = dict(zip(qc_lib.METRICS, got))
        assert m["sat_frac"] == pytest.approx(0.25)
        assert m["mean"] == pytest.approx(100.0 * 0.75 + 255.0 * 0.25)
        assert m["p99"] == pytest.approx(255.0)
        # inf level = saturation disabled
        got2 = np.asarray(qc(jnp.asarray(img), jnp.asarray(np.inf)))
        assert got2[qc_lib.METRICS.index("sat_frac")] == 0.0

    def test_flag_frames_relative_rules(self):
        rng = np.random.default_rng(1)
        tbl = []
        for t in range(12):
            focus = 100.0 if t != 4 else 1.0   # t=4 defocused
            mean = 50.0 if t != 7 else 5.0     # t=7 dark
            sat = 0.0 if t != 9 else 0.2       # t=9 saturated
            tbl.append([focus + rng.normal(0, 2), 10.0, mean, 5.0,
                        1.0, 99.0, sat])
        flags = qc_lib.flag_frames(np.asarray(tbl))
        assert "focus" in flags[4]
        assert "dark" in flags[7]
        assert "saturated" in flags[9]
        clean = [i for i in range(12) if i not in (4, 7, 9)]
        assert all(not flags[i] for i in clean)
        # single frame: no focus distribution, never flagged
        assert qc_lib.flag_frames(np.asarray(tbl[:1])) == [[]]

    def test_flag_table_validation(self):
        with pytest.raises(ValueError, match="table"):
            qc_lib.flag_frames(np.zeros((3, 4)))

    def test_degenerate_mad_still_flags_gross_defocus(self):
        """>=50% identical focus scores (frozen stage / duplicated
        frames) collapse the MAD to 0 — a grossly defocused frame must
        STILL flag (code-review fix: the old sigma>0 guard disabled
        focus flagging entirely in that regime)."""
        tbl = [[100.0, 10.0, 50.0, 5.0, 1.0, 99.0, 0.0] for _ in range(9)]
        tbl.append([1.0, 10.0, 50.0, 5.0, 1.0, 99.0, 0.0])
        flags = qc_lib.flag_frames(np.asarray(tbl))
        assert flags[9] == ["focus"]
        assert all(not f for f in flags[:9])

    def test_default_saturation_level(self):
        assert qc_lib.default_saturation_level(np.uint16) == 65535.0
        assert qc_lib.default_saturation_level(np.uint8) == 255.0
        assert qc_lib.default_saturation_level(np.float32) is None


class TestQcStackPipeline:
    @pytest.fixture
    def server_env(self, tmp_path):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
        )
        cfg.ensure_dirs()
        return cfg, tmp_path

    def test_flags_bad_frames_e2e(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(2)
        T, S = 10, 48
        stack = np.stack([_scene(rng, S) for _ in range(T)])
        stack[3] = _scene(rng, S, blur=8)     # defocused
        stack[6] *= 0.05                      # dark
        stack = (stack * 400).astype(np.uint16)
        stack[8, :24] = 65535                 # heavily saturated
        path = str(tmp / "stack.tif")
        tiff.write_stack(path, stack)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_frames"] == T and m["n_channels"] == 1
        assert m["n_flagged_frames"] >= 3
        rows = open(st["outputs"]["qc"]).read().strip().split("\n")
        header = rows[0].split(",")
        assert header[:2] == ["t", "channel"] and header[-1] == "flags"
        by_t = {int(r.split(",")[0]): r.split(",")[-1] for r in rows[1:]}
        assert "focus" in by_t[3]
        assert "dark" in by_t[6]
        assert "saturated" in by_t[8]
        clean = [t for t in range(T) if t not in (3, 6, 8)]
        assert all(by_t[t] == "" for t in clean)

    def test_multichannel_and_frame_range(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(3)
        T, S = 6, 32
        c0 = np.stack([_scene(rng, S) for _ in range(T)])
        c1 = np.stack([_scene(rng, S) for _ in range(T)])
        c1[4] *= 0.01  # dark ONLY in channel 1
        p0, p1 = str(tmp / "c0.tif"), str(tmp / "c1.tif")
        tiff.write_stack(p0, c0.astype(np.float32))
        tiff.write_stack(p1, c1.astype(np.float32))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {"frame_range": [2, 6]},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["qc"]).read().strip().split("\n")[1:]
        assert len(rows) == 4 * 2
        recs = [r.split(",") for r in rows]
        assert {r[0] for r in recs} == {"2", "3", "4", "5"}  # absolute t
        flagged = {(r[0], r[1]) for r in recs if "dark" in r[-1]}
        assert flagged == {("4", "1")}

    def test_validation_errors(self, server_env):
        cfg_srv, tmp = server_env
        p0 = str(tmp / "c0.tif")
        tiff.write_stack(p0, np.ones((3, 16, 16), np.float32))
        p1 = str(tmp / "c1.tif")
        tiff.write_stack(p1, np.ones((2, 16, 16), np.float32))
        srv = ImageServer(cfg_srv)
        for name, params, inputs, frag in (
            ("v1", {}, [p0, p1], "disagree"),
            ("v2", {"focus_mad_k": 0}, [p0], "thresholds"),
            ("v3", {"dark_fraction": 1.5}, [p0], "thresholds"),
            # non-numeric params are deterministic JobErrors, not raw
            # ValueErrors that burn retries (code-review fix)
            ("v4", {"focus_mad_k": "3,5"}, [p0], "bad qc param"),
            ("v5", {"saturation_level": "auto"}, [p0], "bad qc param"),
        ):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "qc_stack", "params": params,
                 "input": inputs, "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed"
            assert frag in st["error"], (name, st["error"])


class TestQcStack3D:
    @pytest.fixture
    def server_env(self, tmp_path):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
        )
        cfg.ensure_dirs()
        return cfg, tmp_path

    def test_per_volume_flags_and_focal_drift(self, server_env):
        """Volumes: per-plane rows, per-volume flags on the best-plane
        aggregates, and best_z tracking the focal plane as it creeps."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(4)
        T, Z, S = 6, 5, 32
        d = tmp / "vols"
        d.mkdir()
        sharp = _scene(rng, S)
        for t in range(T):
            vol = np.stack([
                _scene(rng, S, blur=6) for _ in range(Z)
            ])
            focal = min(t, Z - 1)  # the sharp plane CREEPS upward
            vol[focal] = sharp + rng.normal(0, 1, (S, S))
            if t == 3:  # a fully-defocused volume
                vol = np.stack([
                    _scene(rng, S, blur=8) for _ in range(Z)
                ])
            tiff.write_stack(str(d / f"t{t:02d}.tif"), vol.astype(np.float32))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {"dims": 3},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_frames"] == T and m["best_z_drift"] >= 2
        rows = open(st["outputs"]["qc"]).read().strip().split("\n")
        assert rows[0].startswith("t,channel,z,")
        assert len(rows) == 1 + T * Z
        vrows = open(st["outputs"]["qc_volumes"]).read().strip().split("\n")
        assert vrows[0].startswith("t,channel,best_z,")
        recs = [r.split(",") for r in vrows[1:]]
        assert len(recs) == T
        by_t = {int(r[0]): r for r in recs}
        # best_z follows the creeping focal plane (away from t=3)
        for t in (0, 1, 2, 4):
            assert int(by_t[t][2]) == min(t, Z - 1), by_t[t]
        # the defocused volume is flagged; the others are clean
        assert "focus" in by_t[3][-1]
        assert all(by_t[t][-1] == "" for t in (0, 1, 2, 4, 5))

    def test_3d_with_z_pages_and_validation(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(5)
        T, Z, S = 3, 4, 24
        stack = np.stack(
            [_scene(rng, S) for _ in range(T * Z)]
        ).astype(np.float32)
        path = str(tmp / "tz.tif")
        tiff.write_stack(path, stack)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {"dims": 3, "z": Z},
             "input": [path], "output": out},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert json.loads(st["outputs"]["metrics"])["n_frames"] == T

        out2 = str(tmp / "bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {"dims": 4},
             "input": [path], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed" and "dims" in st2["error"]

    def test_single_plane_spike_flags_the_volume(self, server_env):
        """Saturation is absolute: ONE laser-spiked plane must flag the
        whole volume (review fix — a Z-mean diluted it under sat_max)."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(6)
        T, Z, S = 3, 8, 24
        d = tmp / "vols"
        d.mkdir()
        for t in range(T):
            vol = np.stack(
                [(_scene(rng, S) * 200) for _ in range(Z)]
            ).astype(np.uint16)
            if t == 1:
                vol[5] = 65535  # one fully saturated plane of eight
            tiff.write_stack(str(d / f"t{t:02d}.tif"), vol)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "qc_stack", "params": {"dims": 3},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m.get("n_saturated", 0) == 1
        assert "total_s" in m  # schema parity with the 2D path
        vrows = open(st["outputs"]["qc_volumes"]).read().strip().split("\n")
        by_t = {r.split(",")[0]: r.split(",")[-1] for r in vrows[1:]}
        assert "saturated" in by_t["1"]
        assert by_t["0"] == "" and by_t["2"] == ""

    def test_half_integer_drift_not_truncated(self):
        """best_zs [2,2,2,3,3,3]: median 2.5, genuine one-plane walk —
        int() used to truncate the 0.5 deviation to zero drift."""
        bz = np.asarray([2, 2, 2, 3, 3, 3])
        med = float(np.median(bz))
        drift = round(float(np.abs(bz - med).max()), 1)
        assert drift == 0.5
