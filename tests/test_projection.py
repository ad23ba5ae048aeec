"""Tests: z-projection (ops/projection.py + the project_stack pipeline).

The volumetric→2D bridge — an extension beyond the reference's
capability list (its era projected host-side in ImageJ before
submitting jobs).
"""

import json
import os

import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.ops import projection as proj_lib
from sequitr_tpu.server import ImageServer, submit_job


def _blur(img, n):
    for _ in range(n):
        img = (
            img
            + np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 5.0
    return img


def _focus_volume(rng, z=5, size=48, sharp_z=2):
    """A z-stack where only plane ``sharp_z`` carries sharp texture."""
    base = rng.random((size, size)).astype(np.float32) * 100
    vol = np.stack([
        base if k == sharp_z else _blur(base, 4) for k in range(z)
    ])
    return vol


class TestReductions:
    def test_reductions_match_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        vol = (rng.random((4, 24, 24)) * 1000).astype(np.float32)
        jvol = jnp.asarray(vol)
        for method, ref in [
            ("max", vol.max(0)),
            ("min", vol.min(0)),
            ("sum", vol.sum(0)),
            ("mean", vol.mean(0)),
            ("std", vol.std(0)),
            ("median", np.median(vol, 0)),
        ]:
            got, aux = proj_lib.make_projector(method)(jvol)
            np.testing.assert_allclose(
                np.asarray(got), ref, rtol=1e-5, atol=1e-3,
                err_msg=method,
            )
            assert int(np.asarray(aux)) == -1

    def test_selection_methods_preserve_dtype(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        vol = (rng.random((3, 16, 16)) * 60000).astype(np.uint16)
        jvol = jnp.asarray(vol)
        for method in ("max", "min", "best_focus"):
            got, _ = proj_lib.make_projector(method)(jvol)
            assert np.asarray(got).dtype == np.uint16, method
        for method in ("mean", "sum", "std", "median", "edof"):
            got, _ = proj_lib.make_projector(method)(jvol)
            assert np.asarray(got).dtype == np.float32, method
        np.testing.assert_array_equal(
            np.asarray(proj_lib.make_projector("max")(jvol)[0]),
            vol.max(0),
        )

    def test_param_validation(self):
        with pytest.raises(ValueError, match="method"):
            proj_lib.make_projector("nope")
        with pytest.raises(ValueError, match="radius"):
            proj_lib.make_projector("edof", radius=-1)
        with pytest.raises(ValueError, match="gamma"):
            proj_lib.make_projector("edof", gamma=0.0)
        with pytest.raises(ValueError, match="mode"):
            proj_lib.make_projector("edof", mode="avg")


class TestBestFocus:
    def test_picks_the_sharp_plane(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        vol = _focus_volume(rng, z=5, sharp_z=3)
        got, z = proj_lib.make_projector("best_focus")(jnp.asarray(vol))
        assert int(np.asarray(z)) == 3
        np.testing.assert_array_equal(np.asarray(got), vol[3])


class TestEDoF:
    def _split_volume(self, rng, size=64):
        """Left half sharp in plane 0, right half sharp in plane 2;
        plane 1 blurry everywhere. Ground truth = sharp composite."""
        left = rng.random((size, size)).astype(np.float32) * 100
        right = rng.random((size, size)).astype(np.float32) * 100
        truth = np.where(
            np.arange(size)[None, :] < size // 2, left, right
        ).astype(np.float32)
        blur = _blur(truth, 5)
        half = size // 2
        p0 = blur.copy()
        p0[:, :half] = truth[:, :half]
        p2 = blur.copy()
        p2[:, half:] = truth[:, half:]
        return np.stack([p0, _blur(truth, 5), p2]), truth

    def test_edof_beats_any_single_plane(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        vol, truth = self._split_volume(rng)
        for mode in ("blend", "select"):
            got, height = proj_lib.make_projector(
                "edof", radius=4, mode=mode
            )(jnp.asarray(vol))
            got = np.asarray(got)
            err = np.abs(got - truth).mean()
            best_single = min(
                np.abs(vol[k] - truth).mean() for k in range(3)
            )
            assert err < 0.35 * best_single, (mode, err, best_single)
            # the height map localizes the sharp plane per side, away
            # from the seam where the windows mix
            h = np.asarray(height)
            assert np.median(h[:, :24]) == 0
            assert np.median(h[:, 40:]) == 2

    def test_flat_volume_blends_to_mean(self):
        import jax.numpy as jnp

        vol = np.stack([
            np.full((8, 8), v, np.float32) for v in (10.0, 20.0, 60.0)
        ])
        got, _ = proj_lib.make_projector("edof")(jnp.asarray(vol))
        np.testing.assert_allclose(np.asarray(got), 30.0, rtol=1e-5)


class TestProjectStackPipeline:
    @pytest.fixture
    def server_env(self, tmp_path):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
        )
        cfg.ensure_dirs()
        return cfg, tmp_path

    def _volume_timelapse(self, tmp, rng, t=3, z=4, size=32,
                          dtype=np.uint16):
        stacks = (rng.random((t, z, size, size)) * 1000).astype(dtype)
        path = str(tmp / "vols.tif")
        tiff.write_stack(path, stacks.reshape(t * z, size, size))
        return path, stacks

    def test_mip_e2e_single_file_z_pages(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(4)
        path, stacks = self._volume_timelapse(tmp, rng)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "project_stack", "params": {"z": 4},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        got = tiff.read_stack(st["outputs"]["projected"])
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, stacks.max(1))
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_frames"] == 3 and m["method"] == "max"

    def test_best_focus_csv_and_z_range(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(5)
        t, z = 3, 5
        vols = np.stack([
            _focus_volume(rng, z=z, sharp_z=(2 + tt) % z)
            for tt in range(t)
        ])
        path = str(tmp / "vols.tif")
        tiff.write_stack(path, vols.reshape(t * z, 48, 48))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "project_stack",
             "params": {"z": z, "method": "best_focus",
                        "z_range": [1, 5]},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["projection"]).read().strip().split("\n")
        assert rows[0] == "t,channel,best_z"
        by_t = {int(r.split(",")[0]): int(r.split(",")[2])
                for r in rows[1:]}
        # sharp planes 2, 3, 4 all inside z_range -> absolute indices
        assert by_t == {0: 2, 1: 3, 2: 4}
        got = tiff.read_stack(st["outputs"]["projected"])
        np.testing.assert_array_equal(got[1], vols[1, 3])

    def test_edof_height_map_and_channels(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(6)
        t, z, size = 2, 3, 48
        c0 = np.stack([
            _focus_volume(rng, z=z, size=size, sharp_z=1)
            for _ in range(t)
        ])
        c1 = np.stack([
            _focus_volume(rng, z=z, size=size, sharp_z=2)
            for _ in range(t)
        ])
        p0, p1 = str(tmp / "c0.tif"), str(tmp / "c1.tif")
        tiff.write_stack(p0, c0.reshape(t * z, size, size))
        tiff.write_stack(p1, c1.reshape(t * z, size, size))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "project_stack",
             "params": {"z": z, "method": "edof", "save_height": True},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        for ch, sharp_z in ((0, 1), (1, 2)):
            proj = tiff.read_stack(st["outputs"][f"projected_c{ch}"])
            assert proj.shape == (t, size, size)
            assert proj.dtype == np.float32
            h = tiff.read_stack(st["outputs"][f"height_c{ch}"])
            assert h.dtype == np.uint16
            assert int(np.median(h)) == sharp_z

    def test_validation_errors(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(7)
        path, _ = self._volume_timelapse(tmp, rng)

        def run(params, out_name):
            out = str(tmp / out_name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "project_stack", "params": params,
                 "input": [path], "output": out},
            )
            assert ImageServer(cfg_srv).poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            return st

        st = run({"z": 4, "method": "nope"}, "o1")
        assert st["state"] == "failed" and "method" in st["error"]
        st = run({"z": 4, "z_range": [3, 9]}, "o2")
        assert st["state"] == "failed" and "z_range" in st["error"]
        st = run({"z": 4, "z_range": [2, 1]}, "o3")
        assert st["state"] == "failed" and "z_range" in st["error"]
        st = run({"z": 4, "save_height": True}, "o4")
        assert st["state"] == "failed" and "save_height" in st["error"]
        st = run({"z": 5}, "o5")  # 12 pages do not divide into z=5
        assert st["state"] == "failed"
        # deterministic input errors fail fast (JobError = no retry)
        for name in ("o1", "o2", "o3", "o4", "o5"):
            stf = json.load(
                open(os.path.join(str(tmp / name), "status.json"))
            )
            assert stf["state"] == "failed"
            assert "JobError" in stf["error"]
