"""Train and commit the fixture checkpoints used by bench.py's fidelity
measurements (round-4 verdict item 1).

Each fixture is trained on the deterministic synthetic scenes
(``sequitr_tpu/data/synthetic.py``) through the SAME fit machinery the
server's train pipelines use, then saved as float16 flat npz +
``manifest.json`` entry under ``sequitr_tpu/fixtures/`` (the
import/export-model interchange layout — see ``models/fixtures.py``).

Run on the TPU chip (a few minutes end to end):

    python tools/make_fixtures.py            # all fixtures
    python tools/make_fixtures.py --only unet2d_cells
    python tools/make_fixtures.py --quick    # tiny step counts (smoke test)

The tool is deliberately NOT part of the package: fixtures are committed
artifacts, regenerated only when the synthetic task or architectures
change. Training recipes (steps, LR, batch) are recorded per fixture in
the manifest for reproducibility.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("SEQUITR_FIXTURES_CPU") == "1":
    # this machine's sitecustomize force-registers the TPU plugin and
    # overrides JAX_PLATFORMS; pin the config value itself (must happen
    # before any backend initialization)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from sequitr_tpu.data import records, synthetic  # noqa: E402
from sequitr_tpu.models import fixtures, gan as gan_lib, unet, zoo  # noqa: E402
from sequitr_tpu.ops import weightmaps  # noqa: E402
from sequitr_tpu.pipeline import fit as fit_lib  # noqa: E402
from sequitr_tpu.pipeline import train as train_lib  # noqa: E402

P_LO, P_HI = 5.0, 99.5


def _normalize(img: np.ndarray) -> np.ndarray:
    """The record-build normalize (server.py build_records): records store
    normalized intensities so training sees the distribution tiled
    inference feeds the net."""
    lo, hi = np.percentile(img, [P_LO, P_HI])
    return np.clip((img - lo) / max(hi - lo, 1e-8), 0.0, 1.0).astype(np.float32)


def _seg_shards(work: str, n: int, shape, volumetric: bool = False):
    def gen():
        for i in range(n):
            if volumetric:
                img, lab = synthetic.cells_volume(1000 + i, shape)
            else:
                img, lab = synthetic.cells_frame(1000 + i, shape)
            w = weightmaps.unet_weight_map(lab, num_classes=3)
            yield records.SegExample(_normalize(img), lab, w)

    return records.write_segmentation_shards(
        os.path.join(work, "seg3d" if volumetric else "seg2d"), gen(), shard_size=64
    )


def _pair_shards(work: str, n: int, shape):
    from scipy import ndimage

    shard_size = 64
    n_shards = max(1, -(-n // shard_size))
    paths = []
    i = 0
    for s in range(n_shards):
        path = os.path.join(work, f"pairs-{s:05d}-of-{n_shards:05d}.tfrecord")
        with records.RecordWriter(path) as w:
            for _ in range(min(shard_size, n - s * shard_size)):
                img, _ = synthetic.cells_frame(5000 + i, shape)
                x = _normalize(img)
                # denoise/smooth target: clean structure at the same scale
                y = ndimage.gaussian_filter(x, 1.5).astype(np.float32)
                w.write(fit_lib.encode_pair(x, y))
                i += 1
        paths.append(path)
    return paths


def _dtype():
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def make_teacher(work: str, quick: bool):
    cfg = zoo.get("unet2d_3class")
    import dataclasses

    cfg = dataclasses.replace(cfg, compute_dtype=_dtype())
    shards = _seg_shards(work, 48 if quick else 360, (256, 256))
    steps = 30 if quick else 1500
    tc = train_lib.TrainConfig(
        learning_rate=1e-3, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10, eval_every=max(10, steps // 4),
        eval_limit=16, checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_unet(cfg, tc, fc, shards)
    miou = _eval_unet(cfg, state, shards)
    fixtures.save(
        "unet2d_cells", "unet", cfg, state.params, state.model_state,
        {"task": "synthetic 3-class cells (data/synthetic.py)",
         "recipe": {"steps": steps, "batch": 8, "lr": "1e-3 cosine",
                    "examples": 48 if quick else 360, "patch": 256},
         "holdout_miou": miou},
    )
    return cfg, state


def _eval_unet(cfg, state, shards) -> float:
    """Holdout mIoU of the final params (fresh frames, seeds never trained)."""
    from sequitr_tpu.ops import losses

    n = 8
    volumetric = cfg.dims == 3
    ious = []
    for i in range(n):
        if volumetric:
            img, lab = synthetic.cells_volume(777_000 + i, (16, 64, 64))
        else:
            img, lab = synthetic.cells_frame(777_000 + i, (256, 256))
        x = jnp.asarray(_normalize(img))[None, ..., None]
        logits, _ = unet.apply(cfg, state.params, state.model_state, x, train=False)
        pred = np.asarray(jnp.argmax(logits[0], -1))
        per_class = np.asarray(losses.iou(jnp.asarray(pred), jnp.asarray(lab), 3))
        ious.append(np.nanmean(per_class))
    return round(float(np.mean(ious)), 4)


def make_student(work: str, quick: bool, s2d: int, teacher_cfg, teacher_state):
    name = f"unet2d_cells_fast{'' if s2d == 2 else s2d}"
    import dataclasses

    cfg = zoo.get("unet2d_3class_fast" if s2d == 2 else "unet2d_3class_fast4")
    cfg = dataclasses.replace(cfg, compute_dtype=_dtype())
    shards = sorted(
        os.path.join(work, f) for f in os.listdir(work) if f.startswith("seg2d")
    ) or _seg_shards(work, 48 if quick else 360, (256, 256))
    steps = 30 if quick else 1000
    tc = train_lib.TrainConfig(
        learning_rate=1e-3, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10, eval_every=max(10, steps // 4),
        eval_limit=16, checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    distill = fit_lib.Distill(
        teacher_cfg=teacher_cfg, teacher_params=teacher_state.params,
        teacher_state=teacher_state.model_state,
    )
    state = fit_lib.fit_unet(cfg, tc, fc, shards, distill=distill)
    miou = _eval_unet(cfg, state, shards)
    fixtures.save(
        name, "unet", cfg, state.params, state.model_state,
        {"task": "distilled from unet2d_cells (fit.Distill)",
         "recipe": {"steps": steps, "batch": 8, "lr": "1e-3 cosine",
                    "alpha": 0.5, "temperature": 2.0, "s2d": s2d},
         "holdout_miou": miou},
    )


def make_unet3d(work: str, quick: bool):
    import dataclasses

    cfg = zoo.get("unet3d_3class")
    cfg = dataclasses.replace(cfg, compute_dtype=_dtype())
    shards = _seg_shards(work, 24 if quick else 240, (16, 64, 64), volumetric=True)
    steps = 20 if quick else 800
    tc = train_lib.TrainConfig(
        learning_rate=1e-3, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=2, holdout_every=10, eval_every=max(10, steps // 4),
        eval_limit=4, checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_unet(cfg, tc, fc, shards)
    miou = _eval_unet(cfg, state, shards)
    fixtures.save(
        "unet3d_cells", "unet", cfg, state.params, state.model_state,
        {"task": "synthetic 3-class cell volumes (data/synthetic.py)",
         "recipe": {"steps": steps, "batch": 2, "lr": "1e-3 cosine",
                    "volume": [16, 64, 64]},
         "holdout_miou": miou},
    )


def make_gan(work: str, quick: bool):
    import dataclasses

    cfg = zoo.get("gan_enhance")
    cfg = dataclasses.replace(cfg, compute_dtype=_dtype())
    shards = _pair_shards(work, 48 if quick else 320, (256, 256))
    steps = 20 if quick else 800
    tc = train_lib.TrainConfig(learning_rate=2e-4, beta1=0.5, augment=False)
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10, eval_every=max(10, steps // 4),
        eval_limit=8, checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_gan(cfg, tc, fc, shards)
    # final holdout PSNR on fresh pairs
    from scipy import ndimage

    psnrs = []
    for i in range(8):
        img, _ = synthetic.cells_frame(888_000 + i, (256, 256))
        x = _normalize(img)
        y = ndimage.gaussian_filter(x, 1.5)
        out, _ = gan_lib.generator_apply(
            cfg, state.params, state.model_state,
            jnp.asarray(x)[None, ..., None], train=False,
        )
        mse = float(np.mean((np.asarray(out[0, ..., 0]) - y) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    psnr = round(float(np.mean(psnrs)), 2)
    fixtures.save(
        "gan_denoise", "gan", cfg, state.params, state.model_state,
        {"task": "smooth/denoise synthetic cells (gaussian sigma=1.5 target)",
         "recipe": {"steps": steps, "batch": 8, "lr": "2e-4 b1=0.5",
                    "l1_weight": 100.0},
         "holdout_psnr": psnr},
    )


def make_n2v(work: str, quick: bool):
    """Noise2Void denoiser fixture: trained on NOISY frames alone (the
    self-supervised contract), scored against the clean renders it never
    saw (``synthetic.denoise_pair``)."""
    import dataclasses

    cfg = dataclasses.replace(zoo.get("n2v_denoise"), compute_dtype=_dtype())
    n = 64 if quick else 320
    shards = records.write_shards(
        os.path.join(work, "n2v"),
        (
            fit_lib.encode_image_example(
                synthetic.denoise_pair(9000 + i, (128, 128))[1]
            )
            for i in range(n)
        ),
        shard_size=64,
    )
    steps = 30 if quick else 1200
    tc = train_lib.TrainConfig(
        learning_rate=4e-4, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10, eval_every=max(10, steps // 4),
        eval_limit=8, checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_n2v(cfg, tc, fc, shards, mask_frac=0.01, radius=5)
    # holdout PSNR vs the clean truth on fresh seeds (never trained)
    psnrs, psnrs_in = [], []
    for i in range(8):
        clean, noisy = synthetic.denoise_pair(999_000 + i, (128, 128))
        out, _ = unet.apply(
            cfg, state.params, state.model_state,
            jnp.asarray(noisy)[None, ..., None], train=False,
        )
        out = np.asarray(out[0, ..., 0], np.float32)
        psnrs.append(10 * np.log10(1.0 / max(float(np.mean((out - clean) ** 2)), 1e-12)))
        psnrs_in.append(
            10 * np.log10(1.0 / max(float(np.mean((noisy - clean) ** 2)), 1e-12))
        )
    fixtures.save(
        "n2v_cells", "n2v", cfg, state.params, state.model_state,
        {"task": "self-supervised denoise of synthetic cells "
                 "(data/synthetic.py denoise_pair, sigma=0.1)",
         "recipe": {"steps": steps, "batch": 8, "lr": "4e-4 cosine",
                    "mask_frac": 0.01, "radius": 5, "examples": n,
                    "patch": 128},
         "holdout_psnr": round(float(np.mean(psnrs)), 2),
         "noisy_input_psnr": round(float(np.mean(psnrs_in)), 2)},
    )


def make_flows(work: str, quick: bool):
    """Flow-field instance segmenter fixture: trained on the deterministic
    touching-cell instance scenes (``synthetic.instances_frame``), scored
    by Hungarian instance AP on fresh seeds."""
    import dataclasses

    from sequitr_tpu.ops import flows as flows_ops

    cfg = dataclasses.replace(zoo.get("flows_cells"), compute_dtype=_dtype())
    n = 16 if quick else 160

    def gen():
        for i in range(n):
            img, lab = synthetic.instances_frame(7000 + i, (128, 128))
            flow, prob = flows_ops.flow_targets(lab)
            yield fit_lib.encode_flow_example(_normalize(img), flow, prob)

    shards = records.write_shards(
        os.path.join(work, "flows"), gen(), shard_size=64
    )
    steps = 30 if quick else 1500
    tc = train_lib.TrainConfig(
        learning_rate=3e-4, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10,
        eval_every=max(10, steps // 4), eval_limit=8,
        checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_flows(cfg, tc, fc, shards)
    # holdout instance AP on fresh seeds (never trained)
    aps, mious = [], []
    for i in range(8):
        img, lab = synthetic.instances_frame(997_000 + i, (128, 128))
        out, _ = unet.apply(
            cfg, state.params, state.model_state,
            jnp.asarray(_normalize(img))[None, ..., None], train=False,
        )
        out = np.asarray(out[0], np.float32)
        flow = out[..., :2] / flows_ops.FLOW_SCALE
        prob = 1.0 / (1.0 + np.exp(-out[..., 2]))
        pred = flows_ops.masks_from_flows(flow, prob, n_iter=150)
        ap = flows_ops.average_precision(lab, pred)
        aps.append(ap["ap50"])
        mious.append(ap["mean_matched_iou"])
    fixtures.save(
        "flows_cells", "flows", cfg, state.params, state.model_state,
        {"task": "flow-field instance segmentation of touching synthetic "
                 "cells (data/synthetic.py instances_frame)",
         "recipe": {"steps": steps, "batch": 8, "lr": "3e-4 cosine",
                    "examples": n, "patch": 128},
         "holdout_ap50": round(float(np.mean(aps)), 4),
         "holdout_matched_iou": round(float(np.mean(mious)), 4)},
    )


def make_stars(work: str, quick: bool):
    """Star-convex instance segmenter fixture: trained on the same
    deterministic touching-cell scenes as the flows fixture
    (``synthetic.instances_frame``), scored by Hungarian instance AP on
    fresh seeds — the two learned separators stay directly comparable."""
    import dataclasses

    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.ops import stardist as sd

    cfg = dataclasses.replace(zoo.get("stars_cells"), compute_dtype=_dtype())
    n = 16 if quick else 160

    def gen():
        for i in range(n):
            img, lab = synthetic.instances_frame(7000 + i, (128, 128))
            dist, prob = sd.star_targets(lab)
            yield fit_lib.encode_stars_example(_normalize(img), dist, prob)

    shards = records.write_shards(
        os.path.join(work, "stars"), gen(), shard_size=64
    )
    steps = 30 if quick else 1500
    tc = train_lib.TrainConfig(
        learning_rate=3e-4, lr_schedule="cosine", lr_decay_steps=steps,
        augment=True,
    )
    fc = fit_lib.FitConfig(
        steps=steps, batch_size=8, holdout_every=10,
        eval_every=max(10, steps // 4), eval_limit=8,
        checkpoint_every=10**9, log_every=max(10, steps // 10),
    )
    state = fit_lib.fit_stars(cfg, tc, fc, shards)
    # holdout instance AP on fresh seeds (never trained)
    aps, mious = [], []
    for i in range(8):
        img, lab = synthetic.instances_frame(997_000 + i, (128, 128))
        out, _ = unet.apply(
            cfg, state.params, state.model_state,
            jnp.asarray(_normalize(img))[None, ..., None], train=False,
        )
        out = np.asarray(out[0], np.float32)
        prob = 1.0 / (1.0 + np.exp(-out[..., 0]))
        dist = np.maximum(out[..., 1:], 0.0)
        pred = sd.instances_from_rays(prob, dist)
        ap = flows_ops.average_precision(lab, pred)
        aps.append(ap["ap50"])
        mious.append(ap["mean_matched_iou"])
    fixtures.save(
        "stars_cells", "stars", cfg, state.params, state.model_state,
        {"task": "star-convex instance segmentation of touching synthetic "
                 "cells (data/synthetic.py instances_frame)",
         "recipe": {"steps": steps, "batch": 8, "lr": "3e-4 cosine",
                    "examples": n, "patch": 128, "n_rays": 32},
         "holdout_ap50": round(float(np.mean(aps)), 4),
         "holdout_matched_iou": round(float(np.mean(mious)), 4)},
    )


def load_teacher():
    """Reuse the committed teacher fixture for distillation (a cut run can
    resume student training without repeating the 30-minute teacher fit)."""
    import types

    kind, cfg, params, state, meta = fixtures.load("unet2d_cells")
    return cfg, types.SimpleNamespace(params=params, model_state=state)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list of: unet2d_cells | fast | fast4 | "
                    "unet3d_cells | gan_denoise | n2v_cells | flows_cells | stars_cells")
    ap.add_argument("--keep-work", action="store_true")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    work = tempfile.mkdtemp(prefix="fixtures-")
    try:
        want = lambda n: only is None or n in only  # noqa: E731
        teacher = None
        if want("unet2d_cells"):
            teacher = make_teacher(work, args.quick)
            print("teacher done:", fixtures.manifest()["unet2d_cells"]["holdout_miou"])
        elif want("fast") or want("fast4"):
            if "unet2d_cells" in fixtures.manifest():
                teacher = load_teacher()
                print("teacher loaded from committed fixture")
            else:
                teacher = make_teacher(work, args.quick)
                print("teacher done:",
                      fixtures.manifest()["unet2d_cells"]["holdout_miou"])
        if want("fast"):
            make_student(work, args.quick, 2, *teacher)
            print("fast done:", fixtures.manifest()["unet2d_cells_fast"]["holdout_miou"])
        if want("fast4"):
            make_student(work, args.quick, 4, *teacher)
            print("fast4 done:", fixtures.manifest()["unet2d_cells_fast4"]["holdout_miou"])
        if want("unet3d_cells"):
            make_unet3d(work, args.quick)
            print("unet3d done:", fixtures.manifest()["unet3d_cells"]["holdout_miou"])
        if want("gan_denoise"):
            make_gan(work, args.quick)
            print("gan done:", fixtures.manifest()["gan_denoise"]["holdout_psnr"])
        if want("n2v_cells"):
            make_n2v(work, args.quick)
            m = fixtures.manifest()["n2v_cells"]
            print("n2v done:", m["holdout_psnr"], "(noisy input",
                  m["noisy_input_psnr"], ")")
        if want("flows_cells"):
            make_flows(work, args.quick)
            m = fixtures.manifest()["flows_cells"]
            print("flows done: ap50", m["holdout_ap50"],
                  "matched_iou", m["holdout_matched_iou"])
        if want("stars_cells"):
            make_stars(work, args.quick)
            m = fixtures.manifest()["stars_cells"]
            print("stars done: ap50", m["holdout_ap50"],
                  "matched_iou", m["holdout_matched_iou"])
    finally:
        if not args.keep_work:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
