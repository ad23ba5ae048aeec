"""Optics-family pipeline tests (server.pipelines.optics): emitter localization, deconvolution (incl. DP/multichannel).

Split out of test_server.py (round-5 verdict item 4).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu import localize
from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet
from sequitr_tpu.server import (
    ImageServer,
    Job,
    JobError,
    claim_job,
    save_model,
    scan_jobs,
    submit_job,
)
from sequitr_tpu.server import server as server_mod


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


class TestEmitterPipeline:
    def test_localize_emitters_job(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        frames = rng.normal(10.0, 0.5, (2, 64, 64)).astype(np.float32)
        truth = [(12.3, 40.6), (33.8, 15.2), (50.1, 50.9)]
        yy, xx = np.mgrid[:64, :64]
        for cy, cx in truth:
            g = 80.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.5**2))
            frames[0] += g
            frames[1] += g  # same emitters in both frames
        path = str(tmp / "emitters.tif")
        tiff.write_stack(path, frames)
        out = str(tmp / "em_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"threshold_sigmas": 8, "sigma": 1.5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert int(st["outputs"]["n_emitters"]) == 6  # 3 per frame
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,y,x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        for t, y, x, a, b in got:
            best = min((abs(y - cy) + abs(x - cx)) for cy, cx in truth)
            assert best < 0.2, (t, y, x, best)

    def test_emitters_btrack_output(self, server_env):
        """btrack: true writes the same object layout the segmentation
        pipelines use — single-particle tracking handoff."""
        import h5py

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(1)
        frames = rng.normal(10.0, 0.5, (2, 32, 32)).astype(np.float32)
        yy, xx = np.mgrid[:32, :32]
        frames += 80.0 * np.exp(-((yy - 15.5) ** 2 + (xx - 20.2) ** 2) / (2 * 1.5**2))
        path = str(tmp / "em_bt.tif")
        tiff.write_stack(path, frames)
        out = str(tmp / "em_bt_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"threshold_sigmas": 8, "btrack": True},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        with h5py.File(st["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
            fmap = f["objects/obj_type_1/map"][:]
        assert coords.shape == (2, 5)  # one emitter per frame, [t,x,y,z,label]
        np.testing.assert_allclose(coords[:, 2], 15.5, atol=0.1)  # y
        np.testing.assert_allclose(coords[:, 1], 20.2, atol=0.1)  # x
        assert fmap.shape[0] == 2  # per-frame slices

    @staticmethod
    def _emitter_volume(truth, shape=(13, 40, 40), seed=0):
        rng = np.random.default_rng(seed)
        zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
        vol = np.full(shape, 20.0)
        for cz, cy, cx in truth:
            vol += 300.0 * np.exp(
                -((zz - cz) ** 2) / (2 * 1.4**2)
                - ((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.4**2)
            )
        return (vol + rng.normal(0, 0.5, shape)).astype(np.float32)

    def test_localize_emitters_3d_volume_timelapse(self, server_env):
        """dims=3: per-timepoint volumetric localization over a volume
        sequence (directory convention); emitters.csv carries z, and
        btrack coords fill the z column for full-xyz tracking."""
        import h5py

        cfg_srv, tmp = server_env
        vols = tmp / "vols"
        os.makedirs(vols)
        truth_t = [
            [(4.3, 12.6, 25.1), (8.8, 30.2, 10.4)],  # t=0
            [(5.1, 13.0, 25.5), (8.5, 29.8, 10.0)],  # t=1 (slight motion)
        ]
        for t, truth in enumerate(truth_t):
            tiff.write_stack(
                str(vols / f"vol_t{t}.tif"), self._emitter_volume(truth, seed=t)
            )
        out = str(tmp / "em3d_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"dims": 3, "threshold": 100, "btrack": True,
                               "sigma": 1.4, "sigma_z": 1.4, "z_scale": 2.0},
                    "input": [str(vols)], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert int(st["outputs"]["n_emitters"]) == 4
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,z,y,x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        for t, z, y, x, a, b in got:
            best = min(
                abs(z - cz) + abs(y - cy) + abs(x - cx)
                for cz, cy, cx in truth_t[int(t)]
            )
            assert best < 0.3, (t, z, y, x, best)
        with h5py.File(st["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
        assert coords.shape == (4, 5)
        # btrack z = csv z * z_scale (csv stays native voxels)
        csv_z = sorted(g[1] for g in got)
        np.testing.assert_allclose(
            sorted(coords[:, 3]), [2.0 * z for z in csv_z], rtol=1e-5
        )

    @staticmethod
    def _astig_widths(z):
        # foci split +/-300 units: sx focuses above 0, sy below
        sx = 1.3 * np.sqrt(1.0 + ((z - 300.0) / 400.0) ** 2)
        sy = 1.3 * np.sqrt(1.0 + ((z + 300.0) / 400.0) ** 2)
        return sy, sx

    @classmethod
    def _astig_frame(cls, truth, shape=(64, 64), seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        frame = np.full(shape, 20.0)
        for cz, cy, cx in truth:
            sy, sx = cls._astig_widths(cz)
            frame += 3000.0 / (2 * np.pi * sx * sy) * np.exp(
                -((yy - cy) ** 2) / (2 * sy**2)
                - ((xx - cx) ** 2) / (2 * sx**2)
            )
        return (frame + rng.normal(0, 0.2, shape)).astype(np.float32)

    def test_calibrate_then_localize_astig_chain(self, server_env):
        """calibrate_astigmatism -> localize_emitters chained via
        depends_on: the localize job points its astigmatism param at the
        calibration job's OUTPUT DIR and recovers emitter z."""
        cfg_srv, tmp = server_env
        zs = np.linspace(-600, 600, 17)
        scan = np.stack(
            [self._astig_frame([(z, 15.7, 16.2)], (32, 32), seed=9)
             for z in zs]
        )
        scan_path = str(tmp / "beads.tif")
        tiff.write_stack(scan_path, scan)
        cal_out = str(tmp / "cal_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism",
                    "params": {"z_start": -600.0, "z_step": 75.0},
                    "input": [scan_path], "output": cal_out},
                   job_id="cal")
        truth = [(250.0, 20.5, 40.2), (-380.0, 45.1, 18.7)]
        frame_path = str(tmp / "astig_frames.tif")
        tiff.write_stack(frame_path, self._astig_frame(truth)[None])
        loc_out = str(tmp / "loc_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal_out, "threshold": 40,
                               "btrack": True},
                    "input": [frame_path], "output": loc_out,
                    "depends_on": [cal_out]},
                   job_id="loc")
        srv = ImageServer(cfg_srv)
        deadline = time.time() + 120
        while time.time() < deadline:
            srv.poll_once()
            if os.path.exists(os.path.join(loc_out, "status.json")):
                break
            time.sleep(0.1)
        st_cal = json.load(open(os.path.join(cal_out, "status.json")))
        assert st_cal["state"] == "complete", st_cal.get("error")
        metrics = json.loads(st_cal["outputs"]["metrics"])
        assert metrics["roundtrip_z_rmse_frac"] < 0.02
        calib = json.load(open(st_cal["outputs"]["calibration"]))
        assert set(calib) >= {"qx", "qy", "z_range", "window"}

        st = json.load(open(os.path.join(loc_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,z,y,x,sigma_y,sigma_x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        assert len(got) == 2
        for cz, cy, cx in truth:
            r = min(got, key=lambda g: abs(g[2] - cy) + abs(g[3] - cx))
            assert abs(r[2] - cy) < 0.1 and abs(r[3] - cx) < 0.1
            assert abs(r[1] - cz) < 25.0, (cz, r)  # ~2% of the 1200-unit range

    def test_localize_data_parallel_matches_streaming(self, server_env):
        """data_parallel: true (frames sharded over the 8-device virtual
        mesh) produces the same emitters as the streaming path, including
        a tail chunk shorter than the device count."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(7)
        n_t = 11  # not a multiple of 8: exercises tail padding
        frames = rng.normal(10.0, 0.5, (n_t, 48, 48)).astype(np.float32)
        yy, xx = np.mgrid[:48, :48]
        for t in range(n_t):
            for cy, cx in [(12.3 + t * 0.1, 30.6), (35.8, 15.2 - t * 0.1)]:
                frames[t] += 80.0 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.5**2)
                )
        path = str(tmp / "dp_em.tif")
        tiff.write_stack(path, frames)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("stream", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dp_{name}_out")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"threshold_sigmas": 8, "btrack": True,
                                   **extra},
                        "input": [path], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        assert (outs["dp"]["outputs"]["n_emitters"]
                == outs["stream"]["outputs"]["n_emitters"])
        rows = {}
        for name, st in outs.items():
            lines = open(st["outputs"]["emitters"]).read().strip().split("\n")
            rows[name] = np.asarray(
                [[float(v) for v in r.split(",")] for r in lines[1:]]
            )
        np.testing.assert_allclose(rows["dp"], rows["stream"], atol=1e-4)
        import h5py

        with h5py.File(outs["dp"]["outputs"]["objects"]) as fd, \
                h5py.File(outs["stream"]["outputs"]["objects"]) as fs:
            np.testing.assert_allclose(
                fd["objects/obj_type_1/coords"][:],
                fs["objects/obj_type_1/coords"][:], atol=1e-4,
            )

    def test_smlm_workflow_chain(self, server_env):
        """Full SMLM story filed up front: calibrate -> astigmatic
        localize (z_scale-consistent btrack units) -> track. One emitter
        walks laterally while defocusing; the tracker must produce a
        single track whose z trend matches truth."""
        cfg_srv, tmp = server_env
        zs = np.linspace(-600, 600, 17)
        scan = np.stack(
            [self._astig_frame([(z, 15.7, 16.2)], (32, 32), seed=9)
             for z in zs]
        )
        scan_path = str(tmp / "smlm_beads.tif")
        tiff.write_stack(scan_path, scan)

        # one emitter moving +1 px/frame in y and +80 units/frame in z
        n_t = 5
        truth = [(-160.0 + 80.0 * t, 20.0 + 1.0 * t, 32.0) for t in range(n_t)]
        frames = np.stack(
            [self._astig_frame([truth[t]], seed=20 + t) for t in range(n_t)]
        )
        frames_path = str(tmp / "smlm_frames.tif")
        tiff.write_stack(frames_path, frames)

        cal_out = str(tmp / "smlm_cal")
        loc_out = str(tmp / "smlm_loc")
        trk_out = str(tmp / "smlm_trk")
        z_scale = 0.01  # calibration units -> xy-pixel units
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism",
                    "params": {"z_start": -600.0, "z_step": 75.0},
                    "input": [scan_path], "output": cal_out}, job_id="c")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal_out, "threshold": 40,
                               "btrack": True, "z_scale": z_scale},
                    "input": [frames_path], "output": loc_out,
                    "depends_on": [cal_out]}, job_id="l")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "track_objects",
                    "params": {"max_distance": 5},
                    "input": [os.path.join(loc_out, "objects.h5")],
                    "output": trk_out,
                    "depends_on": [loc_out]}, job_id="t")
        srv = ImageServer(cfg_srv)
        deadline = time.time() + 180
        while time.time() < deadline:
            srv.poll_once()
            if os.path.exists(os.path.join(trk_out, "status.json")):
                break
            time.sleep(0.1)
        st = json.load(open(os.path.join(trk_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["tracks"]).read().strip().split("\n")
        hdr = rows[0].split(",")
        data = [dict(zip(hdr, r.split(","))) for r in rows[1:]]
        assert len({d["track_id"] for d in data}) == 1  # one unbroken track
        assert len(data) == n_t
        data.sort(key=lambda d: float(d["t"]))
        # z column is in btrack (scaled) units; trend matches truth
        # (window=15 default: measured 0.4%-of-range axial RMSE)
        z_fit = np.polyfit(
            [float(d["t"]) for d in data],
            [float(d["z"]) for d in data], 1,
        )[0]
        assert abs(z_fit - 80.0 * z_scale) < 0.1 * 80.0 * z_scale
        y_fit = np.polyfit(
            [float(d["t"]) for d in data],
            [float(d["y"]) for d in data], 1,
        )[0]
        assert abs(y_fit - 1.0) < 0.05

    def test_localize_corrupt_midstream_fails_fast(self, server_env,
                                                   monkeypatch):
        """A read error mid-stream (corrupt page past the validated
        headers) is deterministic: the streaming path must convert it to
        a JobError and fail without burning retries (review finding)."""
        from sequitr_tpu.data.source import FrameSource

        cfg_srv, tmp = server_env
        path = str(tmp / "mid.tif")
        tiff.write_stack(path, np.zeros((3, 16, 16), np.float32))
        orig = FrameSource.frame

        def bad(self, i):
            if i == 1:
                raise ValueError("corrupt LZW strip in page 1")
            return orig(self, i)

        monkeypatch.setattr(FrameSource, "frame", bad)
        out = str(tmp / "mid_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters", "params": {"threshold": 5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        t0 = time.time()
        assert srv.poll_once()
        elapsed = time.time() - t0
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "corrupt LZW strip" in st["error"]
        assert elapsed < cfg_srv.retry_backoff + 1.0  # no retry burn

    def test_localize_3d_data_parallel_matches_streaming(self, server_env):
        """dims=3 + data_parallel: TIMEPOINTS sharded over the virtual
        mesh produce the same emitters as the streaming volumetric path
        (11 timepoints over 8 devices: tail padding exercised)."""
        cfg_srv, tmp = server_env
        vols = tmp / "dp3d_vols"
        os.makedirs(vols)
        rng = np.random.default_rng(17)
        n_t = 11
        for t in range(n_t):
            truth = [(4.0 + 0.2 * t, 12.0 + 0.5 * t, 25.0),
                     (8.0, 30.0, 10.0 + 0.3 * t)]
            tiff.write_stack(
                str(vols / f"v_t{t:02d}.tif"),
                self._emitter_volume(truth, seed=100 + t),
            )
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dp3d_{name}_out")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"dims": 3, "threshold": 100,
                                   "sigma": 1.4, "sigma_z": 1.4, **extra},
                        "input": [str(vols)], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        a = open(outs["dp"]["outputs"]["emitters"]).read()
        b = open(outs["st"]["outputs"]["emitters"]).read()
        assert a.split("\n")[0] == "t,z,y,x,amplitude,background"
        ra = np.asarray([[float(v) for v in r.split(",")]
                         for r in a.strip().split("\n")[1:]])
        rb = np.asarray([[float(v) for v in r.split(",")]
                         for r in b.strip().split("\n")[1:]])
        assert ra.shape == rb.shape == (2 * n_t, 6)
        np.testing.assert_allclose(ra, rb, atol=1e-4)

    def test_localize_astig_data_parallel_matches_streaming(
        self, server_env
    ):
        """astigmatism + data_parallel: frames sharded over the virtual
        mesh produce the same emitters.csv as the streaming astigmatic
        path (11 frames over 8 devices: tail padding exercised)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        frames = np.stack(
            [
                TestEmitterPipeline._astig_frame(
                    [(250.0 - 40 * t, 20.5, 40.2),
                     (-380.0 + 30 * t, 45.1, 18.7)],
                    seed=50 + t,
                )
                for t in range(11)
            ]
        )
        path = str(tmp / "dpa.tif")
        tiff.write_stack(path, frames)
        # the analytic curve matching _astig_widths (sigma^2 quadratics)
        calib = {"qx": [1.05625e-05, -0.0063375, 2.640625],
                 "qy": [1.05625e-05, 0.0063375, 2.640625],
                 "z_range": [-600.0, 600.0]}
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpa_{name}")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"astigmatism": calib,
                                   "threshold": 40, **extra},
                        "input": [path], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        a = open(outs["dp"]["outputs"]["emitters"]).read()
        b = open(outs["st"]["outputs"]["emitters"]).read()
        assert a.split("\n")[0] == (
            "t,z,y,x,sigma_y,sigma_x,amplitude,background"
        )
        ra = np.asarray([[float(v) for v in r.split(",")]
                         for r in a.strip().split("\n")[1:]])
        rb = np.asarray([[float(v) for v in r.split(",")]
                         for r in b.strip().split("\n")[1:]])
        assert ra.shape == rb.shape == (22, 8)
        np.testing.assert_allclose(ra, rb, atol=1e-3)

    def test_astig_structurally_bad_calibration_fails_fast(self, server_env):
        """'qx': 1 hits len() on an int (TypeError) — as deterministic as
        a ValueError; must fail fast, not burn retries (review finding)."""
        cfg_srv, tmp = server_env
        path = str(tmp / "f.tif")
        tiff.write_stack(path, np.zeros((1, 16, 16), np.float32))
        cal = str(tmp / "bad_cal.json")
        with open(cal, "w") as f:
            json.dump({"qx": 1, "qy": [0, 0, 1], "z_range": [-1, 1]}, f)
        out = str(tmp / "badcal_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal, "threshold": 5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        t0 = time.time()
        assert srv.poll_once()
        elapsed = time.time() - t0
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "astigmatism" in st["error"]
        assert elapsed < cfg_srv.retry_backoff + 1.0  # no retry burn

    def test_astig_btrack_without_z_scale_warns(self, server_env):
        """Mixed units out of the box (calibration z next to pixel x/y)
        surface as a status warning, not silently useless tracking."""
        cfg_srv, tmp = server_env
        frame_path = str(tmp / "aw.tif")
        tiff.write_stack(frame_path, self._astig_frame([(100.0, 30.0, 30.0)]))
        out = str(tmp / "aw_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": {
                        "qx": [1.05625e-05, -0.0063375, 2.640625],
                        "qy": [1.05625e-05, 0.0063375, 2.640625],
                        "z_range": [-600.0, 600.0]},
                        "threshold": 40, "btrack": True},
                    "input": [frame_path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert any("z_scale" in w for w in st.get("warnings", []))

        # setting z_scale silences it
        out2 = str(tmp / "aw2_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": {
                        "qx": [1.05625e-05, -0.0063375, 2.640625],
                        "qy": [1.05625e-05, 0.0063375, 2.640625],
                        "z_range": [-600.0, 600.0]},
                        "threshold": 40, "btrack": True, "z_scale": 0.01},
                    "input": [frame_path], "output": out2})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        assert not any("z_scale" in w for w in st2.get("warnings", []))

    def test_localize_astig_rejects_dims3(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "x.tif")
        tiff.write_stack(path, np.zeros((2, 16, 16), np.float32))
        out = str(tmp / "bad_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"dims": 3, "astigmatism": {"qx": [0, 0, 1],
                               "qy": [0, 0, 1], "z_range": [-1, 1]}},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "does not combine" in st["error"]

    def test_calibrate_missing_z_params_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "beads0.tif")
        tiff.write_stack(path, np.zeros((5, 16, 16), np.float32))
        out = str(tmp / "calbad_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism", "params": {},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "z_positions" in st["error"]


class TestDeconvolvePipeline:
    def test_deconvolve_sharpens_blurred_points(self, server_env):
        """RL deconvolution through the job API: a Gaussian-blurred point
        source gets sharper (higher peak, same location)."""
        from sequitr_tpu import psf

        cfg_srv, tmp = server_env
        import jax.numpy as jnp_

        rng = np.random.default_rng(0)
        clean = np.zeros((2, 48, 48), np.float32)
        clean[0, 16, 20] = 100.0
        clean[1, 30, 10] = 80.0
        kernel = np.asarray(psf.gaussian_psf_2d(9, 1.5))
        blurred = np.stack(
            [np.asarray(psf.psf_convolve(jnp_.asarray(f), jnp_.asarray(kernel)))
             for f in clean]
        ).astype(np.float32)
        stack_path = str(tmp / "blur.tif")
        tiff.write_stack(stack_path, blurred)
        out = str(tmp / "dc")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"iterations": 30, "sigma": 1.5, "psf_size": 9},
             "input": [stack_path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        deconv = tiff.read_stack(st["outputs"]["deconvolved"])
        assert deconv.shape == (2, 48, 48)
        for t in range(2):
            # peak sharpens substantially and stays put
            assert deconv[t].max() > 2.0 * blurred[t].max()
            np.testing.assert_array_equal(
                np.unravel_index(deconv[t].argmax(), deconv[t].shape),
                np.unravel_index(clean[t].argmax(), clean[t].shape),
            )

    def test_deconvolve_3d_volume(self, server_env):
        cfg_srv, tmp = server_env
        vol = np.zeros((8, 16, 16), np.float32)
        vol[4, 8, 8] = 50.0
        vol_path = str(tmp / "v.tif")
        tiff.write_stack(vol_path, vol)
        out = str(tmp / "dc3")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"dims": 3, "iterations": 5, "sigma": 1.0,
                        "psf_size": 5, "psf_size_z": 3, "sigma_z": 1.0},
             "input": [vol_path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        deconv = tiff.read_stack(st["outputs"]["deconvolved"])
        assert deconv.shape == (8, 16, 16)
        assert np.all(np.isfinite(deconv))

    def test_deconvolve_3d_timelapse(self, server_env):
        """dims=3 over a volume SEQUENCE: per-timepoint outputs through
        one cached graph, equal to the single-volume pipeline's result;
        frame_range selects timepoints (absolute naming)."""
        from sequitr_tpu import psf  # noqa: F401  (parity with single)

        cfg_srv, tmp = server_env
        d = tmp / "vols"
        d.mkdir()
        vols = []
        for t in range(3):
            v = np.zeros((8, 16, 16), np.float32)
            v[4, 6 + 2 * t, 8] = 50.0
            vols.append(v)
            tiff.write_stack(str(d / f"t_{t}.tif"), v)
        params = {"dims": 3, "iterations": 5, "sigma": 1.0,
                  "psf_size": 5, "psf_size_z": 3, "sigma_z": 1.0}
        out = str(tmp / "dct")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": dict(params, frame_range=[1, 3]),
             "input": [str(d)], "output": out},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        names = sorted(
            n for n in os.listdir(out) if n.startswith("deconvolved_t")
        )
        assert names == ["deconvolved_t0001.tif", "deconvolved_t0002.tif"]
        # per-timepoint result equals the single-volume pipeline's
        single_out = str(tmp / "dc1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": params,
             "input": [str(d / "t_1.tif")], "output": single_out},
        )
        assert srv.poll_once()
        s1 = json.load(open(os.path.join(single_out, "status.json")))
        assert s1["state"] == "complete", s1.get("error")
        np.testing.assert_array_equal(
            tiff.read_stack(os.path.join(out, "deconvolved_t0001.tif")),
            tiff.read_stack(s1["outputs"]["deconvolved"]),
        )

    def test_bad_iterations_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        p = str(tmp / "x.tif")
        tiff.write_stack(p, np.zeros((1, 8, 8), np.float32))
        out = str(tmp / "dcx")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": {"iterations": 0},
             "input": [p], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "iterations" in st["error"]


class TestDeconvolveDP:
    def test_dp_matches_streaming(self, server_env):
        """deconvolve data_parallel: frames sharded over the virtual
        mesh produce the same deconvolved stack as streaming (11 frames
        over 8 devices: tail padding exercised)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(8)
        stack = rng.gamma(2.0, 50.0, (11, 24, 24)).astype(np.float32)
        path = str(tmp / "dpd.tif")
        tiff.write_stack(path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpd_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "deconvolve",
                 "params": {"iterations": 4, "sigma": 1.2, **extra},
                 "input": [path], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        m = json.loads(outs["dp"]["outputs"]["metrics"])
        assert m["n_devices"] > 1
        a = tiff.read_stack(os.path.join(str(tmp / "dpd_dp"), "deconvolved.tif"))
        b = tiff.read_stack(os.path.join(str(tmp / "dpd_st"), "deconvolved.tif"))
        assert np.asarray(a).shape == (11, 24, 24)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_dp_rejects_volume(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "dpd3.tif")
        tiff.write_stack(path, np.zeros((4, 16, 16), np.float32))
        out = str(tmp / "dpd3_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"dims": 3, "data_parallel": True},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "2D-only" in st["error"]


class TestDeconvolveMultiChannel:
    def test_per_channel_outputs_match_separate_runs(self, server_env):
        """Multi-channel deconvolve (one entry per channel): each
        deconvolved_c{k}.tif is identical to deconvolving that channel
        alone; DP agrees too."""
        import jax as _jax

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(9)
        c0 = rng.gamma(2.0, 50.0, (5, 24, 24)).astype(np.float32)
        c1 = rng.gamma(2.0, 80.0, (5, 24, 24)).astype(np.float32)
        tiff.write_stack(str(tmp / "mc0.tif"), c0)
        tiff.write_stack(str(tmp / "mc1.tif"), c1)
        srv = ImageServer(cfg_srv)

        def run(name, inputs, extra=None):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "deconvolve",
                 "params": {"iterations": 3, "sigma": 1.2,
                            **(extra or {})},
                 "input": inputs, "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            return st

        mc = run("mc_both", [str(tmp / "mc0.tif"), str(tmp / "mc1.tif")])
        s0 = run("mc_only0", [str(tmp / "mc0.tif")])
        s1 = run("mc_only1", [str(tmp / "mc1.tif")])
        a0 = np.asarray(tiff.read_stack(mc["outputs"]["deconvolved_c0"]))
        a1 = np.asarray(tiff.read_stack(mc["outputs"]["deconvolved_c1"]))
        b0 = np.asarray(tiff.read_stack(s0["outputs"]["deconvolved"]))
        b1 = np.asarray(tiff.read_stack(s1["outputs"]["deconvolved"]))
        np.testing.assert_allclose(a0, b0, atol=1e-4)
        np.testing.assert_allclose(a1, b1, atol=1e-4)
        if _jax.device_count() >= 2:
            dp = run(
                "mc_dp",
                [str(tmp / "mc0.tif"), str(tmp / "mc1.tif")],
                {"data_parallel": True},
            )
            d0 = np.asarray(
                tiff.read_stack(dp["outputs"]["deconvolved_c0"])
            )
            np.testing.assert_allclose(d0, b0, atol=1e-4)

    def test_volume_multi_entry_rejected(self, server_env):
        """dims=3 with multiple entries must fail loudly, not silently
        deconvolve only the first file (review finding)."""
        cfg_srv, tmp = server_env
        for n in ("v0", "v1"):
            tiff.write_stack(
                str(tmp / f"{n}.tif"), np.zeros((4, 16, 16), np.float32)
            )
        out = str(tmp / "mc3d_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": {"dims": 3},
             "input": [str(tmp / "v0.tif"), str(tmp / "v1.tif")],
             "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "2D-only" in st["error"]
