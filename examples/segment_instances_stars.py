"""Star-convex instance segmentation end-to-end (StarDist-style).

Runs self-contained on CPU (or TPU if available):
    python examples/segment_instances_stars.py /tmp/sequitr_stars_demo

The SECOND learned touching-cell separator (see
``segment_instances_flows.py`` for the first): every pixel predicts its
distances to the instance boundary along 16 fixed rays plus an object
probability, and serving keeps one star-convex polygon per cell via
greedy NMS (Schmidt et al. 2018). The polygon prior is the stronger
separator for convex nucleus-like shapes; flows cover concave shapes
and 3D. This workflow:

1. synthesizes a timelapse of bright cells, some touching, plus the
   ground-truth instance label stack;
2. ``train_stars``: computes ray-distance + normalized-EDT targets per
   frame, builds record shards, trains, registers a model of kind
   ``stars``;
3. ``segment_stars``: the fused serve (tiled forward on device, greedy
   polygon NMS on host) writes per-frame instance maps + a btrack-layout
   objects.h5;
4. ``evaluate_stars``: Hungarian-matched instance AP against the ground
   truth — and a comparison against what plain CCL would have scored.
"""

import json
import os
import sys

# allow running straight from a source checkout: python examples/<name>.py
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

if os.environ.get("SEQUITR_FORCE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

# smoke-lane step cap (tests/test_examples.py): SEQUITR_EXAMPLE_STEPS=N
# truncates training so the lane catches API rot fast; quality bars that
# need a converged model are skipped when the cap is active
_CAP = int(os.environ.get("SEQUITR_EXAMPLE_STEPS", "0"))


def _steps(n):
    return min(n, _CAP) if _CAP else n



def make_scene(rng, n=30, size=48, n_cells=3):
    """(images, instance labels): discs, some pairs touching."""
    imgs = np.zeros((n, size, size), np.float32)
    labs = np.zeros((n, size, size), np.uint16)
    yy, xx = np.mgrid[:size, :size]
    for t in range(n):
        placed = []
        lab = np.zeros((size, size), np.int32)
        for i in range(1, n_cells + 1):
            for _ in range(30):
                r = int(rng.integers(6, 11))
                cy = int(rng.integers(r + 1, size - r - 1))
                cx = int(rng.integers(r + 1, size - r - 1))
                if all(
                    (cy - py) ** 2 + (cx - px) ** 2 >= max(r, pr) ** 2
                    for py, px, pr in placed
                ):
                    break
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
            lab[m & (lab == 0)] = i
            placed.append((cy, cx, r))
        img = 0.15 + 0.7 * (lab > 0) + rng.normal(0, 0.05, lab.shape)
        imgs[t] = np.clip(img, 0, 1)
        labs[t] = lab
    return imgs, labs


def main(base: str):
    from sequitr_tpu import localize
    from sequitr_tpu.config import ServerConfiguration
    from sequitr_tpu.data import tiff
    from sequitr_tpu.server import ImageServer, submit_job

    os.makedirs(base, exist_ok=True)
    cfg = ServerConfiguration(
        jobs_dir=os.path.join(base, "jobs"),
        models_dir=os.path.join(base, "models"),
    )
    cfg.ensure_dirs()
    server = ImageServer(cfg)

    rng = np.random.default_rng(11)
    imgs, labs = make_scene(rng)
    img_path = os.path.join(base, "cells.tif")
    lab_path = os.path.join(base, "instances.tif")
    tiff.write_stack(img_path, imgs)
    tiff.write_stack(lab_path, labs)

    train_out = os.path.join(base, "train")
    seg_out = os.path.join(base, "segmented")
    ev_out = os.path.join(base, "evaluation")
    submit_job(
        cfg.jobs_dir,
        {"module": "train_stars",
         "params": {"model": "stars_demo", "n_rays": 16,
                    "patch": [32, 32], "patches_per_frame": 3,
                    "steps": _steps(400), "batch_size": 8,
                    "learning_rate": 2e-3, "lr_schedule": "cosine",
                    "depth": 2, "base_features": 8,
                    "compute_dtype": "float32",
                    "holdout_every": 10, "keep_best": True},
         "input": [img_path, lab_path], "output": train_out},
    )
    submit_job(
        cfg.jobs_dir,
        {"module": "segment_stars",
         "params": {"model": "stars_demo", "min_area": 20,
                    "save_objects_csv": True},
         "input": [img_path], "output": seg_out,
         "depends_on": [train_out]},
    )
    submit_job(
        cfg.jobs_dir,
        {"module": "evaluate_stars",
         "params": {"model": "stars_demo", "min_area": 20},
         "input": [img_path, lab_path], "output": ev_out,
         "depends_on": [train_out]},
    )
    for _ in range(3):
        assert server.poll_once(), "no job ready"

    st = json.load(open(os.path.join(seg_out, "status.json")))
    assert st["state"] == "complete", st.get("error")
    print("serve:", json.loads(st["outputs"]["metrics"]))

    st = json.load(open(os.path.join(ev_out, "status.json")))
    assert st["state"] == "complete", st.get("error")
    m = json.loads(st["outputs"]["metrics"])
    print(f"instance AP vs truth: ap50={m['ap50']} ap75={m['ap75']} "
          f"mean_matched_iou={m['mean_matched_iou']}")

    # what plain foreground-CCL would have produced on the SAME truth
    # masks: touching pairs merge, so it cannot reach the GT count
    n_ccl = sum(
        int(localize.label_components(labs[t] > 0).max())
        for t in range(len(labs))
    )
    print(f"instances: truth={m['n_gt']} stars={m['n_pred']} "
          f"plain-CCL-on-truth-fg={n_ccl} (merged touching pairs)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sequitr_stars_demo")
