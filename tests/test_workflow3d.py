"""The full 3D+time workflow as ONE up-front chain.

register_stack (dims=3, drift correction) -> segmentation_unet3d
(volume timelapse, btrack objects.h5) -> track_objects (gated-Hungarian
linking) — all three jobs filed at once with ``depends_on``, resolved in
dependency order by a real ImageServer. This is the microscopy pipeline
the framework exists for, exercised end to end: a drifting 3D stack of a
moving cell comes out as one coherent trajectory.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.server import ImageServer, save_model, submit_job


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


class TestRegisterSegmentTrack3D:
    def test_full_chain(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(9)

        # model: the committed TRAINED 3D fixture (the fidelity/golden
        # checkpoint) — segmentation quality is real, not luck-of-init
        from sequitr_tpu.models import fixtures

        kind, net_cfg, params, state, _meta = fixtures.load(
            "unet3d_cells", compute_dtype=jnp.float32
        )
        assert kind == "unet"
        save_model(
            cfg_srv.models_dir, "wf3d", "unet", net_cfg, params, state
        )

        # data: ONE cell (the trained net's own synthetic appearance:
        # Gaussian profile, defocus z-decay) MOVING (+2 y, +1 x per
        # frame) over the STATIC gamma background it was trained
        # against, while the STAGE drifts (integer roll, so registration
        # can undo it bit-exactly); one volume file per timepoint
        d = tmp / "raw"
        d.mkdir()
        n_t, zhw = 4, (16, 64, 64)
        background = rng.gamma(2.0, 60.0, zhw).astype(np.float32)
        stage_drift = [(0, 0, 0), (1, -3, 2), (2, -6, 4), (3, -9, 6)]

        def stamp_cell(vol, cy, cx, cz=8, r=6.0, amp=600.0):
            h, w = vol.shape[1:]
            yy, xx = np.mgrid[0:h, 0:w]
            q = ((yy - cy) / r) ** 2 + ((xx - cx) / r) ** 2
            prof = (amp * np.exp(-0.5 * q * 4.0)).astype(np.float32)
            for dz, gain in ((-2, 0.2), (-1, 0.55), (0, 1.0), (1, 0.55), (2, 0.2)):
                vol[cz + dz] += prof * gain

        for t in range(n_t):
            v = background.copy()
            stamp_cell(v, cy=20.0 + 2 * t, cx=16.0 + 1 * t)
            v = np.roll(v, stage_drift[t], axis=(0, 1, 2))
            tiff.write_stack(str(d / f"t_{t}.tif"), v)

        reg_out = str(tmp / "registered")
        seg_out = str(tmp / "segmented")
        trk_out = str(tmp / "tracks")

        # file the WHOLE chain up front, most-downstream first
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "track_objects",
                "params": {"max_distance": 8.0, "min_track_length": 3},
                "input": [os.path.join(seg_out, "objects.h5")],
                "output": trk_out,
                "depends_on": seg_out,
            },
        )
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "wf3d", "min_area": 20},
                "input": [reg_out],  # the registered per-timepoint files
                "output": seg_out,
                "depends_on": reg_out,
            },
        )
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "register_stack",
                "params": {"dims": 3, "subpixel": False, "window": False},
                "input": [str(d)],
                "output": reg_out,
            },
        )

        srv = ImageServer(cfg_srv)
        for _ in range(3):
            assert srv.poll_once(), "chain stalled"
        for out in (reg_out, seg_out, trk_out):
            status = json.load(open(os.path.join(out, "status.json")))
            assert status["state"] == "complete", (out, status.get("error"))

        # stage drift removed bit-exactly (integer mode)
        s = np.loadtxt(
            os.path.join(reg_out, "shifts.csv"),
            delimiter=",", skiprows=1, usecols=(1, 2, 3),
        )
        np.testing.assert_allclose(
            s, -np.asarray(stage_drift, np.float64), atol=1e-6
        )

        # segmentation found the cell at every timepoint
        seg_status = json.load(open(os.path.join(seg_out, "status.json")))
        assert int(seg_status["outputs"]["n_objects"]) >= n_t

        # tracking linked it into one trajectory moving like the truth
        rows = np.loadtxt(
            os.path.join(trk_out, "tracks.csv"),
            delimiter=",", skiprows=1, usecols=(0, 1, 2, 3, 4),
        ).reshape(-1, 5)  # track_id, t, x, y, z
        # the untrained net also segments static background blobs; the
        # CELL is the track with the largest net displacement, present
        # at every timepoint
        best, best_disp = None, -1.0
        for tid in np.unique(rows[:, 0]):
            tr = rows[rows[:, 0] == tid]
            tr = tr[np.argsort(tr[:, 1])]
            if len(tr) != n_t:
                continue
            disp = float(np.linalg.norm(tr[-1, 2:4] - tr[0, 2:4]))
            if disp > best_disp:
                best, best_disp = tr, disp
        assert best is not None, rows  # some track spans every frame
        # displacement per frame ~ (dx=+1, dy=+2) in a STATIONARY field:
        # the stage drift (up to 9 px/axis) is gone from the trajectory
        steps = np.diff(best[:, 2:4], axis=0)
        np.testing.assert_allclose(
            steps.mean(axis=0), [1.0, 2.0], atol=0.5
        )
