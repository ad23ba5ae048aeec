"""Geometry-family pipeline tests (server.pipelines.geometry): mosaic stitching (backends, tile pool, positions).

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


class TestMosaicPipeline:
    """stitch_mosaic: grid-of-tiles composite through the job API."""

    @staticmethod
    def _scene(shape, seed):
        from sequitr_tpu.data.synthetic import bandlimited_scene

        return bandlimited_scene(
            shape, np.random.default_rng(seed), sigma=0.1, amp=60.0
        )

    def _write_grid(self, tmp, r=2, c=2, h=96, w=96, ov=20, seed=11):
        """Integer-jittered grid cut from one scene; returns (dir, scene,
        true row-major positions)."""
        scene = self._scene((300, 300), seed)
        d = tmp / f"tiles_{seed}"
        os.makedirs(d)
        rng = np.random.default_rng(seed + 1)
        pos = []
        for ri in range(r):
            for ci in range(c):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                tiff.write_stack(
                    str(d / f"tile_{ri}_{ci}.tif"),
                    scene[None, y0 : y0 + h, x0 : x0 + w],
                )
                pos.append((y0, x0))
        return d, scene, np.asarray(pos, float)

    def test_stitch_e2e(self, server_env):
        """Directory of tiles -> mosaic.tif + positions.csv + seams.csv;
        integer mode reproduces the scene exactly where covered."""
        cfg_srv, tmp = server_env
        d, scene, pos = self._write_grid(tmp)
        out = str(tmp / "mosaic_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["rms_residual_px"] < 0.05
        assert m["n_low_confidence"] == 0
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)
        mosaic_img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        if mosaic_img.ndim == 3:
            mosaic_img = mosaic_img[0]
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
        covered = np.zeros(mosaic_img.shape, bool)
        for y0, x0 in rel.astype(int):
            covered[y0 : y0 + 96, x0 : x0 + 96] = True
        np.testing.assert_allclose(
            mosaic_img[covered], want[covered], atol=2e-4
        )
        seams = open(st["outputs"]["seams"]).read().strip().split("\n")
        assert seams[0] == "i,j,dy,dx,response,used"
        assert len(seams) == 1 + 4  # 2x2 grid: 2 horizontal + 2 vertical

    def test_backend_cpu_matches_device_and_rejects_combos(self, server_env):
        """backend: "cpu" pins the stitch to the host backend (the win on
        relay-latency-bound small grids — BASELINE.md FINAL-2) with
        byte-equal outputs on this CPU-pinned suite; bad values and the
        data_parallel combination are deterministic JobErrors."""
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=17)
        srv = ImageServer(cfg_srv)
        outs = {}
        for be in ("device", "cpu"):
            out = str(tmp / f"m_{be}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20, "backend": be},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[be] = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        np.testing.assert_array_equal(outs["cpu"], outs["device"])

        for params, frag in [
            ({"grid": [2, 2], "backend": "gpu"}, "backend"),
            ({"grid": [2, 2], "backend": "cpu", "data_parallel": True},
             "data_parallel"),
        ]:
            out = str(tmp / f"bad_{frag}_{params['backend']}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic", "params": params,
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed" and frag in st["error"]

    def test_backend_auto_policy(self, server_env, monkeypatch):
        """backend: "auto" = the continuation-6 measurement as policy —
        host for <=16-seam grids on an accelerator default backend,
        device otherwise; the resolved choice lands in the outputs."""
        from sequitr_tpu.server.pipelines.geometry import _resolve_mosaic_backend

        mk = lambda params: Job(
            id="t", module="stitch_mosaic", func="run",
            params=params, input=[], output="", path="",
        )
        # accelerator default: small grid -> host, big scan -> device,
        # data_parallel always device, malformed grid -> device (the
        # body then rejects it loudly)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3]})) == "cpu"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [20, 20]})) == "device"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3], "data_parallel": True})
        ) == "device"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": "nope"})) == "device"
        # host default: nothing to pin away from
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3]})) == "device"

        # e2e: auto completes and reports the resolved backend
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=23)
        out = str(tmp / "m_auto")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20, "backend": "auto"},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert st["outputs"]["backend"] in ("cpu", "device")

    def test_estimate_only_and_snake(self, server_env):
        cfg_srv, tmp = server_env
        d, _, pos = self._write_grid(tmp, seed=21)
        # snake acquisition order: rename row-1 tiles in reverse order
        # (acquisition order c=1 then c=0) and stitch with order=snake
        snake_d = tmp / "snake_tiles"
        os.makedirs(snake_d)
        names = sorted(os.listdir(d))  # tile_0_0, 0_1, 1_0, 1_1
        acq = [names[0], names[1], names[3], names[2]]
        for k, n in enumerate(acq):
            os.link(str(d / n), str(snake_d / f"acq_{k}.tif"))
        out = str(tmp / "snake_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20, "order": "snake",
                        "estimate_only": True, "subpixel": False},
             "input": [str(snake_d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "mosaic" not in st["outputs"]
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)

    @pytest.mark.parametrize(
        "params,frag",
        [
            ({}, "grid"),
            ({"grid": [2]}, "grid"),
            # bool is an int subclass: must still be rejected
            ({"grid": [True, 2]}, "grid"),
            ({"grid": [2, 2], "order": "spiral"}, "order"),
            ({"grid": [2, 2], "overlap": 2}, "overlap"),
            ({"grid": [2, 2], "refine": 0}, "refine"),
            ({"grid": [2, 2], "min_response": "x"}, "min_response"),
            ({"grid": [3, 2]}, "tiles"),
        ],
    )
    def test_param_validation(self, server_env, params, frag):
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=31)
        out = str(tmp / f"bad_{frag}_{len(params)}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic", "params": params,
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]

    def test_stitch_data_parallel_matches_single(self, server_env):
        """data_parallel seam estimation produces identical outputs (2x3
        grid: 7 seams over 8 virtual devices exercises pad-to-mesh)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, r=2, c=3, seed=41)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpmos_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 3], "overlap": 20, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        m_dp = json.loads(outs["dp"]["outputs"]["metrics"])
        assert m_dp["n_devices"] > 1
        a = open(outs["dp"]["outputs"]["positions"]).read()
        b = open(outs["st"]["outputs"]["positions"]).read()
        pa = np.loadtxt(a.splitlines(), delimiter=",", skiprows=1)
        pb = np.loadtxt(b.splitlines(), delimiter=",", skiprows=1)
        np.testing.assert_allclose(pa, pb, atol=1e-4)
        ma = tiff.read_stack(outs["dp"]["outputs"]["mosaic"])
        mb = tiff.read_stack(outs["st"]["outputs"]["mosaic"])
        np.testing.assert_allclose(
            np.asarray(ma), np.asarray(mb), atol=1e-4
        )

    def test_multichannel_shared_positions(self, server_env):
        """One input entry per channel: seams ride channel 0, the same
        positions composite every channel (integer mode: exact)."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 51)
        scene2 = (0.5 * scene + 30.0).astype(np.float32)
        d0, d1 = tmp / "mc_c0", tmp / "mc_c1"
        os.makedirs(d0)
        os.makedirs(d1)
        rng = np.random.default_rng(52)
        h = w = 96
        ov = 20
        pos = []
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                for d, sc in ((d0, scene), (d1, scene2)):
                    tiff.write_stack(
                        str(d / f"tile_{ri}_{ci}.tif"),
                        sc[None, y0 : y0 + h, x0 : x0 + w],
                    )
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        out = str(tmp / "mc_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False},
             "input": [str(d0), str(d1)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "mosaic" not in st["outputs"]  # per-channel names
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        m = json.loads(st["outputs"]["metrics"])
        for key, sc in (("mosaic_c0", scene), ("mosaic_c1", scene2)):
            img = np.asarray(tiff.read_stack(st["outputs"][key]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = sc[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            np.testing.assert_allclose(
                img[covered], want[covered], atol=2e-4, err_msg=key
            )

    def test_channel_count_mismatch_fails(self, server_env):
        cfg_srv, tmp = server_env
        d0, _, _ = self._write_grid(tmp, seed=61)
        d1 = tmp / "short_chan"
        os.makedirs(d1)
        # channel 1 has only 3 tiles for a 2x2 grid
        for k, n in enumerate(sorted(os.listdir(d0))[:3]):
            os.link(str(d0 / n), str(d1 / n))
        out = str(tmp / "mc_bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20},
             "input": [str(d0), str(d1)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "channel 1" in st["error"] and "disagrees" in st["error"]

    def test_timelapse_streams_per_timepoint(self, server_env):
        """timelapse: true — R*C per-position T-page stacks composite
        into a T-page mosaic with positions estimated once (integer
        mode: every timepoint exact where covered)."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 71)
        h = w = 96
        ov = 20
        n_t = 3
        d = tmp / "tl_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(72)
        pos = []
        # time variation: a global per-timepoint gain (content evolves,
        # geometry does not)
        gains = [1.0, 1.3, 0.8]
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                stack = np.stack(
                    [g * scene[y0 : y0 + h, x0 : x0 + w] for g in gains]
                )
                tiff.write_stack(str(d / f"pos_{ri}_{ci}.tif"), stack)
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        out = str(tmp / "tl_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "timelapse": True},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_timepoints"] == n_t
        mos = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        assert mos.shape == (n_t, m["canvas_h"], m["canvas_w"])
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        covered = np.zeros(mos.shape[1:], bool)
        for y0, x0 in rel:
            covered[y0 : y0 + h, x0 : x0 + w] = True
        for t, g in enumerate(gains):
            want = g * scene[
                oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]
            ]
            np.testing.assert_allclose(
                mos[t][covered], want[covered], atol=5e-4,
                err_msg=f"t={t}",
            )

    def test_timelapse_length_mismatch_fails(self, server_env):
        cfg_srv, tmp = server_env
        d = tmp / "tl_bad"
        os.makedirs(d)
        rng = np.random.default_rng(73)
        for k in range(4):
            n_pages = 3 if k != 2 else 2  # one position short
            tiff.write_stack(
                str(d / f"pos_{k}.tif"),
                rng.normal(100, 10, (n_pages, 64, 64)).astype(np.float32),
            )
        out = str(tmp / "tl_bad_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 16,
                        "timelapse": True},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "disagrees" in st["error"]

    def test_tile_pool_fd_cap(self, tmp_path):
        """_TilePool never holds more than max_open readers: round-robin
        access beyond the budget evicts LRU and re-opens correctly."""
        from sequitr_tpu.server.pipelines.geometry import _TilePool

        paths = []
        for k in range(6):
            pth = str(tmp_path / f"p{k}.tif")
            tiff.write_stack(
                pth, np.full((2, 8, 8), float(k), np.float32)
            )
            paths.append(pth)
        pool = _TilePool(paths)
        assert pool.max_open >= 8  # at least the floor
        pool.max_open = 2  # force eviction pressure
        for t in range(2):
            for k in range(6):
                f = np.asarray(pool.source(k).frame(t))
                assert float(f[0, 0]) == float(k)
                assert len(pool._open) <= 2
        pool.close()
        assert len(pool._open) == 0

    def test_flatfield_removes_vignetting(self, server_env):
        """flatfield: true — a shared vignette is divided out; the
        corrected composite matches the scene (to a global gain) far
        better than the uncorrected one, and the profile range lands in
        the metrics."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 81)
        h = w = 96
        ov = 20
        yy = np.linspace(-1, 1, h)[:, None]
        xx = np.linspace(-1, 1, w)[None, :]
        vig = (1.0 - 0.4 * (yy**2 + xx**2)).astype(np.float32)
        d = tmp / "vig_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(82)
        pos = []
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                tiff.write_stack(
                    str(d / f"t_{ri}_{ci}.tif"),
                    vig[None] * scene[None, y0 : y0 + h, x0 : x0 + w],
                )
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        srv = ImageServer(cfg_srv)
        errs = {}
        for name, extra in (
            ("off", {}), ("on", {"flatfield": True}),
        ):
            out = str(tmp / f"ff_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            a, b = img[covered], want[covered]
            gain = a.mean() / b.mean()  # correction is up to a scale
            errs[name] = float(
                np.abs(a - gain * b).mean() / max(b.std(), 1e-9)
            )
            if name == "on":
                assert m["flatfield_min"] < 0.9 < 1.05 < m["flatfield_max"]
        assert errs["on"] < 0.25 * errs["off"], errs

    def test_match_gains_removes_seam_steps(self, server_env):
        """match_gains: per-tile photobleaching factors are solved from
        overlap ratios; the corrected composite matches the scene (to a
        global gain) far better than the uncorrected one."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 91)
        h = w = 96
        ov = 20
        d = tmp / "bleach_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(92)
        fade = [1.0, 0.85, 0.72, 0.6]  # photobleaching across the scan
        pos = []
        for k, (ri, ci) in enumerate(
            [(0, 0), (0, 1), (1, 0), (1, 1)]
        ):
            jy, jx = (0, 0) if k == 0 else rng.integers(-2, 3, 2)
            y0 = ri * (h - ov) + 6 + int(jy)
            x0 = ci * (w - ov) + 6 + int(jx)
            tiff.write_stack(
                str(d / f"t_{ri}_{ci}.tif"),
                fade[k] * scene[None, y0 : y0 + h, x0 : x0 + w],
            )
            pos.append((y0, x0))
        pos = np.asarray(pos, float)
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        srv = ImageServer(cfg_srv)
        errs = {}
        for name, extra in (("off", {}), ("on", {"match_gains": True})):
            out = str(tmp / f"mg_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            a, b = img[covered], want[covered]
            gain = a.mean() / b.mean()
            errs[name] = float(
                np.abs(a - gain * b).mean() / max(b.std(), 1e-9)
            )
            if name == "on":
                assert m["gain_min"] < 0.95 < 1.05 < m["gain_max"]
        assert errs["on"] < 0.15 * errs["off"], errs

    def test_positions_reuse_chain(self, server_env):
        """positions: <previous stitch output dir> — an estimate_only
        solve is reused by a later composite (chained via depends_on);
        output identical to estimating in-job."""
        cfg_srv, tmp = server_env
        d, scene, pos = self._write_grid(tmp, seed=95)
        est_out = str(tmp / "pos_est")
        reuse_out = str(tmp / "pos_reuse")
        direct_out = str(tmp / "pos_direct")
        base = {"module": "stitch_mosaic",
                "input": [str(d)]}
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False,
                                "estimate_only": True},
             "output": est_out},
        )
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False,
                                "positions": est_out},
             "output": reuse_out, "depends_on": est_out},
        )
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False},
             "output": direct_out},
        )
        srv = ImageServer(cfg_srv)
        for _ in range(3):
            assert srv.poll_once()
        sts = {}
        for out in (est_out, reuse_out, direct_out):
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", (out, st.get("error"))
            sts[out] = st
        a = np.asarray(tiff.read_stack(sts[reuse_out]["outputs"]["mosaic"]))
        b = np.asarray(tiff.read_stack(sts[direct_out]["outputs"]["mosaic"]))
        np.testing.assert_allclose(a, b, atol=1e-5)
        # reused seams.csv is honest: header only (no seams measured)
        seams = open(sts[reuse_out]["outputs"]["seams"]).read().strip()
        assert seams == "i,j,dy,dx,response,used"

    @pytest.mark.parametrize(
        "given,frag",
        [
            ("/nonexistent/positions.csv", "cannot read positions"),
            ([[0, 0]], "positions for a 2x2 grid"),
            (7, "must be a positions.csv path"),
            # ragged inline list: deterministic, not a retry burn
            ([[0, 0], [1]], "inline positions"),
            # NaN would become INT64_MIN origins deep in the blend
            ([[0, 0], [0, 76], [76, 0], [None, 76]], "non-finite"),
        ],
    )
    def test_positions_reuse_validation(self, server_env, given, frag):
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=96)
        out = str(tmp / f"posbad_{frag[:6].strip()}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "positions": given},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]

    def test_flatfield_numeric_booleans(self, server_env):
        """flatfield: 1/0 are the hand-written JSON boolean spellings —
        1 behaves like true (order 2, never a plane fit), 0 like false;
        out-of-range orders fail deterministically."""
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=97)
        srv = ImageServer(cfg_srv)

        def run(ff):
            out = str(tmp / f"ffnum_{ff}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, "flatfield": ff},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            return json.load(open(os.path.join(out, "status.json")))

        st1 = run(1)
        assert st1["state"] == "complete", st1.get("error")
        assert "flatfield_min" in json.loads(st1["outputs"]["metrics"])
        st0 = run(0)
        assert st0["state"] == "complete", st0.get("error")
        assert "flatfield_min" not in json.loads(st0["outputs"]["metrics"])
        st7 = run(7)
        assert st7["state"] == "failed"
        assert "flatfield order 7" in st7["error"]

    def test_positions_reuse_skips_dp_setup(self, server_env):
        """data_parallel + positions: no seams are correlated, so the
        mesh is never built and n_devices stays out of the metrics."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=98)
        est = str(tmp / "dp_pos_est")
        out = str(tmp / "dp_pos_out")
        srv = ImageServer(cfg_srv)
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "estimate_only": True},
             "input": [str(d)], "output": est},
        )
        assert srv.poll_once()
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "positions": est,
                        "data_parallel": True},
             "input": [str(d)], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "n_devices" not in json.loads(st["outputs"]["metrics"])


class TestAutoOverlapJob:
    def test_auto_overlap(self, server_env):
        """overlap: 'auto' — the hint is measured from the tiles
        (whole-tile wrap = -ov); positions still recovered exactly and
        the metrics record the estimation."""
        cfg_srv, tmp = server_env
        d, _, pos = TestMosaicPipeline()._write_grid(tmp, seed=99)
        out = str(tmp / "auto_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": "auto",
                        "subpixel": False},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["overlap_estimated"] is True
        # estimates absorb the per-seam jitter (+/-2 px here); the strip
        # correlator refines sub-pixel, so nominal-scale accuracy is all
        # the hint needs
        assert abs(m["overlap_y"] - 20) <= 4 and abs(m["overlap_x"] - 20) <= 4
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)

    def test_bad_overlap_string(self, server_env):
        cfg_srv, tmp = server_env
        d, _, _ = TestMosaicPipeline()._write_grid(tmp, seed=100)
        out = str(tmp / "badov_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": "automatic"},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "'auto'" in st["error"]
