"""The whole-slide 2D workflow as ONE up-front chain.

stitch_mosaic (grid of overlapping fields → composite) →
segmentation_unet2d (TRAINED fixture net over the composite, btrack
objects.h5) — filed at once with ``depends_on`` and resolved in
dependency order by a real ImageServer. The assertion closes the loop
against GROUND TRUTH: the scene the tiles were cut from has known cell
labels, so the mask segmented from the STITCHED composite is scored
against the truth labels on the stitched region — seams, placement and
segmentation all have to be right at once.
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


class TestStitchSegment:
    def test_full_chain(self, server_env):
        cfg_srv, tmp = server_env

        from sequitr_tpu.data import synthetic
        from sequitr_tpu.models import fixtures

        kind, net_cfg, params, state, _meta = fixtures.load(
            "unet2d_cells", compute_dtype=jnp.float32
        )
        assert kind == "unet"
        save_model(
            cfg_srv.models_dir, "wf2d", "unet", net_cfg, params, state
        )

        # one cells scene with known labels, acquired as a 2x3 grid of
        # overlapping fields with integer stage jitter (integer-mode
        # stitching composites it back exactly where covered)
        scene, lab = synthetic.cells_frame(77, (300, 440))
        r, c, h, w, ov = 2, 3, 140, 150, 28
        d = tmp / "fields"
        d.mkdir()
        rng = np.random.default_rng(78)
        pos = []
        for ri in range(r):
            for ci in range(c):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -3, 4, 2
                )
                y0 = ri * (h - ov) + 8 + int(jy)
                x0 = ci * (w - ov) + 8 + int(jx)
                tiff.write_stack(
                    str(d / f"f_{ri}_{ci}.tif"),
                    scene[None, y0 : y0 + h, x0 : x0 + w],
                )
                pos.append((y0, x0))
        pos = np.asarray(pos, float)

        mos_out = str(tmp / "mosaic")
        seg_out = str(tmp / "segmented")

        # whole chain filed up front, downstream first
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {
                    "model": "wf2d",
                    "patch": [128, 128],
                    "overlap": [32, 32],
                    "min_area": 20,
                },
                "input": [os.path.join(mos_out, "mosaic.tif")],
                "output": seg_out,
                "depends_on": mos_out,
            },
        )
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "stitch_mosaic",
                "params": {
                    "grid": [r, c], "overlap": ov, "subpixel": False
                },
                "input": [str(d)],
                "output": mos_out,
            },
        )

        srv = ImageServer(cfg_srv)
        for _ in range(2):
            assert srv.poll_once(), "chain stalled"
        for out in (mos_out, seg_out):
            status = json.load(open(os.path.join(out, "status.json")))
            assert status["state"] == "complete", (out, status.get("error"))

        # positions recovered exactly (integer mode, rich cell content)
        got_pos = np.loadtxt(
            os.path.join(mos_out, "positions.csv"),
            delimiter=",", skiprows=1,
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)

        # the mask from the STITCHED composite scores against the truth
        # labels of the original scene on the covered region
        labels = np.asarray(tiff.read_stack(os.path.join(seg_out, "labels.tif")))
        if labels.ndim == 3:
            labels = labels[0]
        m = json.loads(
            json.load(open(os.path.join(mos_out, "status.json")))[
                "outputs"
            ]["metrics"]
        )
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        want = lab[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
        covered = np.zeros(labels.shape, bool)
        for y0, x0 in rel.astype(int):
            covered[y0 : y0 + h, x0 : x0 + w] = True
        got_fg = (labels > 0) & covered
        want_fg = (want > 0) & covered
        inter = (got_fg & want_fg).sum()
        union = (got_fg | want_fg).sum()
        assert union > 0
        iou = inter / union
        assert iou > 0.5, f"foreground IoU {iou:.3f} on the stitched mosaic"

        seg_status = json.load(open(os.path.join(seg_out, "status.json")))
        seg_metrics = json.loads(seg_status["outputs"]["metrics"])
        assert int(seg_metrics["n_objects"]) >= 3
