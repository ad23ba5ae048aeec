"""Training pipelines: record building and the train_* jobs.

Split out of ``server.py`` (round-5 verdict item 4): ``build_records`` /
``build_gan_pairs`` shard builders, ``train_unet2d`` / ``train_unet3d`` /
``train_gan`` / ``train_n2v`` and giant-frame ``finetune_spatial``.
The flows/stars training jobs live with their serving family in
``pipelines.instances``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.jobs import Job
from sequitr_tpu.server.server import (
    _check_ignore_collision,
    _ema_or_raw_params,
    _parse_ema_decay,
    _parse_ignore_label,
    _parse_patience,
    _parse_z_pages,
    _require_param,
    _resolve_globs,
    _resolve_inputs,
    _train_mesh,
    load_model_cached,
    register,
    save_model,
    unet_config_from_params,
)

import logging
log = logging.getLogger("sequitr_tpu.server")

@register("build_records")
def build_records(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Build training record shards from image + label TIFF stacks.

    The reference computes U-Net weight maps at record-creation time
    (SURVEY.md §3.2); this pipeline mirrors that: input = [images.tif,
    labels.tif], params: weight_maps (bool, default True), w0, sigma,
    shard_size, num_classes, dims (2: each frame of a (T, H, W) stack is
    one example; 3: the whole (Z, H, W) stack is one volumetric example),
    patch + patches_per_example (random-crop sub-examples, e.g. 256x256
    patches from 1024x1024 frames or sub-volumes from a z-stack), seed.

    ``ignore_label`` (sparse/partial annotations — the realistic hand-
    labelling regime): pixels carrying this label value are UNANNOTATED.
    They get loss weight 0 (the weighted CE's sum(w)-normalization makes
    that a true ignore) and are remapped to class 0 in the stored labels
    so downstream one-hots stay in range; class-balance statistics count
    only annotated pixels. Works with or without ``weight_maps`` (without,
    the stored weights are the pure annotation mask) and must not collide
    with a real class id (use e.g. 255).

    Output: ``train-*.tfrecord`` shards.
    """
    from sequitr_tpu.data import records, tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import weightmaps

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError("build_records needs [*image stacks, labels]")
    *img_paths, lab_path = paths
    p = job.params
    dims = int(p.get("dims", 2))
    # parse ONCE, before the default-class scan touches it: a malformed
    # value must be a deterministic JobError, not a retried ValueError
    ignore_label = _parse_ignore_label(job)
    closers: list = []  # lazy readers to close once the shards are written

    if dims == 3:
        # the whole (Z, H, W) stack is ONE volume example — eager read
        chans = [
            np.asarray(tiff.read_stack(ip), dtype=np.float32)
            for ip in img_paths
        ]
        labels3 = np.asarray(tiff.read_stack(lab_path)).astype(np.int32)
        if labels3.ndim != 3:
            raise jobs_lib.JobError(
                f"dims=3 expects one (Z, H, W) stack, got {labels3.shape}"
            )
        for c in chans:
            if c.shape != labels3.shape:
                raise jobs_lib.JobError(
                    f"image/label shape mismatch: {c.shape} vs {labels3.shape}"
                )
        images3 = np.stack(chans, axis=-1) if len(chans) > 1 else chans[0]
        multi_channel = len(chans) > 1
        n_frames = 1

        def pair_iter():
            yield images3, labels3

        default_classes = 0
        if "num_classes" not in p:
            vals = labels3
            if ignore_label is not None:
                vals = vals[vals != ignore_label]
            default_classes = int(vals.max()) + 1 if vals.size else 1
    else:
        # dims=2: stream frame pairs lazily — a timelapse larger than host
        # RAM builds records with O(frame) memory (round-3 streaming)
        try:
            source = FrameSource(paths=img_paths)
        except ValueError as e:
            raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
        closers.append(source.close)
        try:
            l_reader = tiff.TiffReader(lab_path)
            closers.append(l_reader.close)
            l_shape = l_reader.shape
            read_lab = lambda i: np.asarray(
                l_reader.read_frame(i)
            ).astype(np.int32)
        except ValueError:
            arr = np.asarray(tiff.read_stack(lab_path)).astype(np.int32)
            if arr.ndim == 2:
                arr = arr[None]
            l_shape = arr.shape
            read_lab = lambda i: arr[i]
        if (len(source),) + source.spatial != tuple(l_shape):
            raise jobs_lib.JobError(
                f"image/label shape mismatch: "
                f"{(len(source),) + source.spatial} vs {tuple(l_shape)}"
            )
        multi_channel = source.n_channels > 1
        n_frames = len(source)

        def pair_iter():
            for t in range(n_frames):
                yield source.frame(t), read_lab(t)

        default_classes = 0
        if "num_classes" not in p:
            # one bounded pass over the (small) label stack for the
            # default; an ignore_label must not inflate the class count
            def _frame_max(t):
                lab_t = read_lab(t)
                if ignore_label is not None:
                    lab_t = lab_t[lab_t != ignore_label]
                return int(lab_t.max()) if lab_t.size else 0

            default_classes = 1 + max(
                _frame_max(t) for t in range(n_frames)
            )

    patch = tuple(int(v) for v in p["patch"]) if "patch" in p else None
    if patch is not None and len(patch) != dims:
        raise jobs_lib.JobError(f"patch {patch} must have {dims} axes")
    n_crops = int(p.get("patches_per_example", 4))
    rng = np.random.default_rng(int(p.get("seed", 0)))

    num_classes = int(p.get("num_classes", default_classes))
    _check_ignore_collision(ignore_label, num_classes)
    p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))
    counter = {"n": 0}

    def gen_examples():
        for img, lab in jobs_lib.track(
            job, pair_iter(), total=n_frames, phase="frames"
        ):
            # frames arrive in storage dtype; records store float32
            img = np.asarray(img, dtype=np.float32)
            if p.get("normalize", True):
                # records store normalized intensities so training sees the
                # same distribution tiled inference feeds the net (SURVEY.md
                # §3.2/3.3); multi-channel normalizes per channel
                axes = tuple(range(lab.ndim))  # spatial axes only
                lo = np.percentile(img, p_lo, axis=axes, keepdims=True)
                hi = np.percentile(img, p_hi, axis=axes, keepdims=True)
                img = np.clip(
                    (img - lo) / np.maximum(hi - lo, 1e-8), 0.0, 1.0
                ).astype(np.float32)
            if patch is not None:
                if any(ps > s for s, ps in zip(lab.shape, patch)):
                    raise jobs_lib.JobError(
                        f"patch {patch} larger than example {lab.shape}"
                    )
                crops = []
                for _ in range(n_crops):
                    starts = [
                        int(rng.integers(0, s - ps + 1))
                        for s, ps in zip(lab.shape, patch)
                    ]
                    sl = tuple(
                        slice(st, st + ps) for st, ps in zip(starts, patch)
                    )
                    img_sl = sl + (slice(None),) if multi_channel else sl
                    crops.append((img[img_sl], lab[sl]))
            else:
                crops = [(img, lab)]
            for ci, cl in crops:
                valid = None
                if ignore_label is not None:
                    valid = cl != ignore_label
                    cl = np.where(valid, cl, 0).astype(cl.dtype)
                w = None
                if p.get("weight_maps", True):
                    w = weightmaps.unet_weight_map(
                        cl, num_classes=num_classes,
                        w0=float(p.get("w0", 10.0)),
                        sigma=float(p.get("sigma", 5.0)),
                        valid=valid,
                    )
                elif valid is not None:
                    # no Ronneberger map requested: the stored weights
                    # are the pure annotation mask (still a true ignore)
                    w = valid.astype(np.float32)
                counter["n"] += 1
                yield records.SegExample(ci, cl, w)

    try:
        shard_paths = records.write_segmentation_shards(
            os.path.join(job.output, "train"), gen_examples(),
            shard_size=int(p.get("shard_size", 128)),
            compression="gzip" if p.get("compress_records") else None,
        )
    finally:
        for close in closers:
            close()
    return {"shards": os.path.join(job.output, "train-*.tfrecord"),
            "n_examples": str(counter["n"]), "n_shards": str(len(shard_paths))}




def _polyphase_train_param(p, cfg) -> bool:
    """Read the ``polyphase`` training param with deterministic
    rejection of uncovered models (mirrors the serving gate)."""
    poly = bool(p.get("polyphase", False))
    if poly and (
        cfg.dims not in (2, 3) or cfg.space_to_depth != 1
        or cfg.upsample != "transpose" or cfg.depth < 2
    ):
        raise jobs_lib.JobError(
            "polyphase training requires a space_to_depth=1 "
            f"transpose-upsample model of depth >= 2; got dims={cfg.dims}, "
            f"s2d={cfg.space_to_depth}, upsample={cfg.upsample!r}, "
            f"depth={cfg.depth}"
        )
    return poly

@register("train_unet2d")
def train_unet2d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train a 2D U-Net from record shards and register it as a model.

    input: record shard paths (globs allowed). params: model (output name),
    architecture (num_classes, depth, base_features, norm), training
    (steps, batch_size, learning_rate, patch augment flags, ``grad_accum``,
    ``remat`` — rematerialize activations in the backward pass so bigger
    patches/batches fit one chip's HBM at ~1/3 extra forward FLOPs),
    observability (holdout_every, eval_every, dump_eval_images).
    """
    return _train_unet(job, config)


@register("train_unet3d")
def train_unet3d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train a volumetric 3D U-Net from record shards (SURVEY.md §2 UNet3D).

    Same parameters as ``train_unet2d``; ``dims`` defaults to 3 (records
    must hold (Z, H, W) volume examples, e.g. from ``build_records`` with
    ``dims: 3``). Augmentation runs volumetrically: 3-axis flips, in-plane
    rotations and a z-consistent elastic warp.
    """
    # mutate in place (params are per-job) so the ParamTracker and its
    # unknown-param warnings keep working for the 3D variant
    job.params.setdefault("dims", 3)
    return _train_unet(job, config)


def _train_unet(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    import glob as glob_lib

    import jax.numpy as jnp

    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    shard_paths: list = []
    for pattern in _resolve_globs(job):
        shard_paths.extend(sorted(glob_lib.glob(pattern)))
    if not shard_paths:
        raise jobs_lib.JobError(f"job {job.id}: no record shards found")
    p = job.params
    cfg = unet_config_from_params(p)
    steps = int(p.get("steps", 1000))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 1e-4)),
        augment=bool(p.get("augment", True)),
        # augmentation-strength knobs (ADVICE r2: previously only tunable
        # by editing code) — defaults match TrainConfig
        elastic_alpha=float(p.get("elastic_alpha", 20.0)),
        elastic_grid=int(p.get("elastic_grid", 4)),
        p_elastic=float(p.get("p_elastic", 0.5)),
        gain_jitter=float(p.get("gain_jitter", 0.0)),
        offset_jitter=float(p.get("offset_jitter", 0.0)),
        noise_std=float(p.get("noise_std", 0.0)),
        grad_accum=int(p.get("grad_accum", 1)),
        remat=bool(p.get("remat", False)),
        lr_schedule=str(p.get("lr_schedule", "constant")),
        lr_warmup_steps=int(p.get("lr_warmup_steps", 0)),
        # decay horizon defaults to the steps AFTER warmup so the schedule
        # actually reaches lr_end_factor*peak by the end of the run
        lr_decay_steps=int(
            p.get("lr_decay_steps",
                  max(1, steps - int(p.get("lr_warmup_steps", 0))))
        ),
        lr_end_factor=float(p.get("lr_end_factor", 0.01)),
        polyphase=_polyphase_train_param(p, cfg),
    )
    fc = fit_lib.FitConfig(
        steps=steps,
        batch_size=int(p.get("batch_size", 8)),
        checkpoint_every=int(p.get("checkpoint_every", 500)),
        log_every=int(p.get("log_every", 50)),
        holdout_every=int(p.get("holdout_every", 0)),
        eval_every=int(p.get("eval_every", 0)),
        metrics_path=os.path.join(job.output, "metrics.jsonl"),
        dump_eval_images=bool(p.get("dump_eval_images", False)),
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
        keep_best_metric=(
            str(p.get("keep_best_metric", "eval_miou"))
            if p.get("keep_best") or _parse_patience(p)
            else ""
        ),
        early_stop_patience=_parse_patience(p),
        ema_decay=_parse_ema_decay(p),
    )
    if fc.keep_best_metric and not fc.holdout_every:
        raise jobs_lib.JobError(
            "keep_best/early_stop_patience requires holdout_every > 0 "
            "(no eval metric to track)"
        )
    ckpt_dir = os.path.join(job.output, "ckpts")
    init_state = None
    ckpt = fit_lib.latest_checkpoint(ckpt_dir) if p.get("resume", True) else None
    if ckpt:
        # crash/requeue recovery: resume from the newest checkpoint (final,
        # or the highest periodic step_* after a mid-training crash) — the
        # fit loop then runs only the remaining steps
        import jax

        template = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        init_state = train_lib.restore_checkpoint(ckpt, template)
    distill = None
    if p.get("distill_from"):
        # fast-preset recipe: teacher = an already-registered parity model;
        # the student (e.g. a *_fast space-to-depth preset) trains on the
        # same records with CE + soft-target KL
        t_kind, t_cfg, t_params, t_state = load_model_cached(
            config.models_dir, p["distill_from"]
        )
        if t_kind != "unet":
            raise jobs_lib.JobError(
                f"distill_from={p['distill_from']!r} is not a unet model"
            )
        distill = fit_lib.Distill(
            t_cfg, t_params, t_state,
            alpha=float(p.get("distill_alpha", 0.5)),
            temperature=float(p.get("distill_temperature", 2.0)),
        )
    # the fit loop owns the cancel poll (it checkpoints before raising);
    # this reporter only publishes live step progress
    rep = jobs_lib.ProgressReporter(job, steps, phase="steps", raise_on_cancel=False)
    try:
        state = fit_lib.fit_unet(
            cfg, tc, fc, shard_paths, ckpt_dir=ckpt_dir, init_state=init_state,
            mesh=_train_mesh(p, fc.batch_size), distill=distill,
            should_stop=lambda: jobs_lib.cancel_requested(job),
            progress=lambda s, _t: rep.step(s),
        )
    except fit_lib.TrainingCancelled as e:
        # progress is checkpointed (fit saved step_* before raising);
        # surface the job-level terminal state
        raise jobs_lib.JobCancelled(str(e))
    rep.finish()
    best_path = os.path.join(ckpt_dir, "best")
    used_best = fc.keep_best_metric and os.path.isdir(best_path)
    if used_best:
        # register the checkpoint with the best holdout metric, not the last
        state = train_lib.restore_checkpoint(best_path, state)
    reg_params = _ema_or_raw_params(ckpt_dir, fc, state, used_best)
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "unet", cfg,
        reg_params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path}


@register("finetune_spatial")
def finetune_spatial(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Finetune a U-Net on WHOLE giant frames, rows sharded across chips.

    The training counterpart of the ``spatial_parallel`` serving option
    (round-3 verdict item 7 operationalized): frames too large to train
    as one-chip batches — 16k x 16k slide-scanner mosaics — train with
    their rows halo-sharded over the device mesh
    (``parallel.spatial_train``: exact whole-frame semantics, psum'd BN
    batch statistics). No record shards: the job consumes stacks directly.

    input: [*image stacks (one per channel), labels stack]. params:
    ``model`` (output name, required), ``from_model`` (registered model
    to start from; omit to train from scratch using the architecture
    params), ``weights_input`` (optional per-pixel loss-weight stack
    path), ``steps``, ``batch_size`` (default 1), ``learning_rate``,
    ``data_ways`` (hybrid DP x spatial: shard the batch this many ways
    and rows over the rest; default 1 = pure spatial), ``normalize``
    (default true; percentile [p_lo, p_hi] -> [0,1] per frame, matching
    ``build_records``), ``checkpoint_every``, ``log_every``, ``seed``,
    ``resume`` (default true). Frame heights must divide the spatial
    ways x the model's pooling multiple. Cancellation checkpoints first;
    a re-submitted job resumes. Augmentation is off by design (geometric
    warps cross shard boundaries — see parallel.spatial_train).
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu import parallel
    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            "finetune_spatial needs [*image stacks, labels]"
        )
    *img_paths, lab_path = paths
    p = job.params
    try:
        source = FrameSource(paths=img_paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    def lazy_stack(path, dtype):
        """Per-frame lazy reader (giant stacks must not load eagerly —
        the whole point of this pipeline), bulk fallback for exotic
        layouts; returns (shape, read_fn, close_fn)."""
        try:
            r = tiff.TiffReader(path)
            return (
                tuple(r.shape),
                lambda i: np.asarray(r.read_frame(i)).astype(dtype),
                r.close,
            )
        except ValueError:
            arr = np.asarray(tiff.read_stack(path)).astype(dtype)
            if arr.ndim == 2:
                arr = arr[None]
            return tuple(arr.shape), (lambda i: arr[i]), (lambda: None)

    closers = [source.close]
    lab_shape, read_lab, close_lab = lazy_stack(lab_path, np.int32)
    closers.append(close_lab)
    if (len(source),) + source.spatial != lab_shape:
        raise jobs_lib.JobError(
            f"image/label shape mismatch: "
            f"{(len(source),) + source.spatial} vs {lab_shape}"
        )
    read_w = None
    if p.get("weights_input"):
        w_shape, read_w, close_w = lazy_stack(
            str(p["weights_input"]), np.float32
        )
        closers.append(close_w)
        if w_shape != lab_shape:
            raise jobs_lib.JobError(
                f"weights/label shape mismatch: {w_shape} vs {lab_shape}"
            )

    steps = int(p.get("steps", 100))
    batch_size = int(p.get("batch_size", 1))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 1e-5)),
        augment=False,
        grad_accum=int(p.get("grad_accum", 1)),
        remat=bool(p.get("remat", False)),
    )
    if p.get("from_model"):
        kind, cfg, params, model_state = load_model_cached(
            config.models_dir, str(p["from_model"])
        )
        if kind != "unet":
            raise jobs_lib.JobError(
                f"from_model={p['from_model']!r} is not a unet model"
            )
        save_cfg = cfg  # re-register with the SOURCE serving dtype
        if cfg.compute_dtype != jnp.float32:
            # halo-exchange training runs f32 (gradient fidelity on giant
            # frames) but the finetuned model re-registers with the source
            # model's compute dtype so serving keeps its bf16 speed
            cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)
        init = train_lib.TrainState(
            params, model_state, tc.make_optimizer().init(params),
            jnp.zeros((), jnp.int32),
        )
    else:
        cfg = unet_config_from_params(p)
        save_cfg = cfg
        init = None

    d_ways = int(p.get("data_ways", 1))
    n_dev = jax.device_count()
    if d_ways > 1:
        if n_dev % d_ways:
            raise jobs_lib.JobError(
                f"data_ways={d_ways} does not divide {n_dev} devices"
            )
        mesh = parallel.make_mesh2d((d_ways, n_dev // d_ways))
        data_axis, space_axis = "data", "space"
    else:
        mesh = parallel.make_mesh()
        data_axis, space_axis = None, "data"
    if batch_size > len(source):
        raise jobs_lib.JobError(
            f"batch_size={batch_size} exceeds the {len(source)}-frame stack"
        )
    try:
        # fail fast with a deterministic JobError on mesh/shape mismatch
        # (H divisibility, pooling multiple, hybrid batch factor) instead
        # of a retried traceback from inside the fit loop
        from sequitr_tpu.parallel.spatial import _validate_spatial

        _validate_spatial(cfg, mesh.shape[space_axis], source.spatial)
        if batch_size % (mesh.shape[data_axis] if data_axis else 1):
            raise ValueError(
                f"batch_size={batch_size} not divisible by {d_ways} data shards"
            )
    except (ValueError, NotImplementedError) as e:
        raise jobs_lib.JobError(str(e))

    fc = fit_lib.FitConfig(
        steps=steps,
        batch_size=batch_size,
        checkpoint_every=int(p.get("checkpoint_every", 500)),
        log_every=int(p.get("log_every", 50)),
        metrics_path=os.path.join(job.output, "metrics.jsonl"),
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
    )
    ckpt_dir = os.path.join(job.output, "ckpts")
    ckpt = fit_lib.latest_checkpoint(ckpt_dir) if p.get("resume", True) else None
    if ckpt:
        template = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        init = train_lib.restore_checkpoint(ckpt, template)

    normalize = bool(p.get("normalize", True))
    p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))
    n_frames = len(source)

    def frame_batches():
        """Cycle whole frames in batches forever (_run_loop bounds steps).

        Frames normalize per visit — giant stacks are not cached in host
        RAM (same percentile mapping as build_records, so a finetuned
        model sees serving's input distribution)."""
        order_rng = np.random.default_rng(fc.seed)
        while True:
            order = order_rng.permutation(n_frames)
            for s in range(0, n_frames - batch_size + 1, batch_size):
                idx = order[s : s + batch_size]
                imgs = []
                for t in idx:
                    img = np.asarray(source.frame(int(t)), dtype=np.float32)
                    if normalize:
                        axes = tuple(range(len(source.spatial)))
                        lo = np.percentile(img, p_lo, axis=axes, keepdims=True)
                        hi = np.percentile(img, p_hi, axis=axes, keepdims=True)
                        img = np.clip(
                            (img - lo) / np.maximum(hi - lo, 1e-8), 0.0, 1.0
                        ).astype(np.float32)
                    imgs.append(img)
                batch = {
                    "image": np.stack(imgs),
                    "labels": np.stack([read_lab(int(t)) for t in idx]),
                }
                if read_w is not None:
                    batch["weights"] = np.stack(
                        [read_w(int(t)) for t in idx]
                    )
                yield batch

    rep = jobs_lib.ProgressReporter(
        job, steps, phase="steps", raise_on_cancel=False
    )
    try:
        try:
            state = fit_lib.fit_unet_spatial(
                cfg, tc, fc, frame_batches(), mesh, source.spatial,
                ckpt_dir=ckpt_dir, init_state=init,
                data_axis=data_axis, space_axis=space_axis,
                should_stop=lambda: jobs_lib.cancel_requested(job),
                progress=lambda s, _t: rep.step(s),
            )
        except fit_lib.TrainingCancelled as e:
            raise jobs_lib.JobCancelled(str(e))
    finally:
        for close in closers:
            close()
    rep.finish()
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "unet", save_cfg,
        state.params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path}


@register("build_gan_pairs")
def build_gan_pairs(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Build GAN training pair shards from (raw, target) TIFF stacks.

    input: [raw.tif, target.tif] (same shape). params: normalize (bool),
    p_lo/p_hi, shard_size. Output: ``pairs-*.tfrecord``-style shard files.
    """
    from sequitr_tpu.data import records, tiff
    from sequitr_tpu.pipeline import fit as fit_lib

    raw_path, tgt_path = _resolve_inputs(job)[:2]
    raw = np.asarray(tiff.read_stack(raw_path), dtype=np.float32)
    tgt = np.asarray(tiff.read_stack(tgt_path), dtype=np.float32)
    if raw.ndim == 2:
        raw, tgt = raw[None], tgt[None]
    if raw.shape != tgt.shape:
        raise jobs_lib.JobError(f"shape mismatch: {raw.shape} vs {tgt.shape}")
    p = job.params
    p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))

    def norm(img):
        lo, hi = np.percentile(img, [p_lo, p_hi])
        return np.clip((img - lo) / max(hi - lo, 1e-8), 0.0, 1.0).astype(np.float32)

    os.makedirs(job.output, exist_ok=True)
    shard_size = int(p.get("shard_size", 128))
    payloads = []
    for x, y in zip(raw, tgt):
        if p.get("normalize", True):
            x, y = norm(x), norm(y)
        payloads.append(fit_lib.encode_pair(x, y))
    n_shards = max(1, -(-len(payloads) // shard_size))
    for s in range(n_shards):
        path = os.path.join(job.output, f"pairs-{s:05d}-of-{n_shards:05d}.tfrecord")
        with records.RecordWriter(
            path,
            compression="gzip" if job.params.get("compress_records") else None,
        ) as w:
            for pl_ in payloads[s * shard_size : (s + 1) * shard_size]:
                w.write(pl_)
    return {"shards": os.path.join(job.output, "pairs-*.tfrecord"),
            "n_examples": str(len(payloads))}


@register("train_gan")
def train_gan(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train the enhancement GAN from pair shards; registers the model.

    input: pair shard globs. params: model (output name), gen_depth,
    gen_base_features, disc_layers, steps, batch_size, learning_rate,
    l1_weight, compute_dtype.
    """
    import glob as glob_lib

    import jax.numpy as jnp

    from sequitr_tpu.models import gan as gan_lib
    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    shard_paths: list = []
    for pattern in _resolve_globs(job):
        shard_paths.extend(sorted(glob_lib.glob(pattern)))
    if not shard_paths:
        raise jobs_lib.JobError(f"job {job.id}: no pair shards found")
    p = job.params
    cfg = gan_lib.GANConfig(
        in_channels=int(p.get("in_channels", 1)),
        out_channels=int(p.get("out_channels", 1)),
        gen_depth=int(p.get("gen_depth", 4)),
        gen_base_features=int(p.get("gen_base_features", 32)),
        disc_layers=int(p.get("disc_layers", 3)),
        disc_base_features=int(p.get("disc_base_features", 64)),
        compute_dtype=jnp.dtype(p.get("compute_dtype", "bfloat16")),
    )
    steps = int(p.get("steps", 1000))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 2e-4)), beta1=0.5,
        polyphase=_polyphase_train_param(p, cfg.generator_config),
        lr_schedule=str(p.get("lr_schedule", "constant")),
        lr_warmup_steps=int(p.get("lr_warmup_steps", 0)),
        # decay horizon defaults to the steps AFTER warmup so the schedule
        # actually reaches lr_end_factor*peak by the end of the run
        lr_decay_steps=int(
            p.get("lr_decay_steps",
                  max(1, steps - int(p.get("lr_warmup_steps", 0))))
        ),
        lr_end_factor=float(p.get("lr_end_factor", 0.01)),
    )
    fc = fit_lib.FitConfig(
        steps=steps,
        batch_size=int(p.get("batch_size", 4)),
        checkpoint_every=int(p.get("checkpoint_every", 500)),
        log_every=int(p.get("log_every", 50)),
        holdout_every=int(p.get("holdout_every", 0)),
        eval_every=int(p.get("eval_every", 0)),
        metrics_path=os.path.join(job.output, "metrics.jsonl"),
        dump_eval_images=bool(p.get("dump_eval_images", False)),
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
        keep_best_metric=(
            str(p.get("keep_best_metric", "eval_psnr"))
            if p.get("keep_best") or _parse_patience(p)
            else ""
        ),
        early_stop_patience=_parse_patience(p),
        ema_decay=_parse_ema_decay(p),
    )
    if fc.keep_best_metric and not fc.holdout_every:
        raise jobs_lib.JobError(
            "keep_best/early_stop_patience requires holdout_every > 0 "
            "(no eval metric to track)"
        )
    ckpt_dir = os.path.join(job.output, "ckpts")
    init_state = None
    ckpt = fit_lib.latest_checkpoint(ckpt_dir) if p.get("resume", True) else None
    if ckpt:
        import jax

        template = train_lib.create_gan_state(jax.random.PRNGKey(0), cfg, tc)
        init_state = train_lib.restore_checkpoint(ckpt, template)
    rep = jobs_lib.ProgressReporter(job, fc.steps, phase="steps", raise_on_cancel=False)
    try:
        state = fit_lib.fit_gan(
            cfg, tc, fc, shard_paths, ckpt_dir=ckpt_dir,
            init_state=init_state,
            l1_weight=float(p.get("l1_weight", 100.0)),
            mesh=_train_mesh(p, fc.batch_size),
            should_stop=lambda: jobs_lib.cancel_requested(job),
            progress=lambda s, _t: rep.step(s),
        )
    except fit_lib.TrainingCancelled as e:
        raise jobs_lib.JobCancelled(str(e))
    rep.finish()
    best_path = os.path.join(ckpt_dir, "best")
    used_best = fc.keep_best_metric and os.path.isdir(best_path)
    if used_best:
        state = train_lib.restore_checkpoint(best_path, state)
    # the EMA twin covers the GENERATOR subtree only (fit_gan's
    # ema_select); the discriminator keeps its raw weights
    reg_params = _ema_or_raw_params(
        ckpt_dir, fc, state, used_best, subtree="gen"
    )
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "gan", cfg,
        reg_params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path}


@register("train_n2v")
def train_n2v(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train a Noise2Void self-supervised denoiser from NOISY stacks alone.

    The denoising path for users with no paired clean data (the
    enhancement GAN's requirement): blind-spot masking lets a regression
    U-Net learn the clean signal from single noisy images
    (``train.make_n2v_train_step``; Krull et al. 2019).

    input: noisy TIFF stacks — one per input channel, the segmentation
    convention. The job builds its own image-only record shards (random
    ``patch`` crops of percentile-normalized frames, written once under
    the job output and REUSED on resume) and then trains. params:
    ``model`` (output name, required), ``patch`` (crop size, default
    [64, 64]), ``patches_per_frame`` (default 4), ``mask_frac`` (fraction
    of pixels masked per patch, default 0.005), ``radius`` (neighbor
    window, default 5), ``normalize`` (default true: percentile-normalize
    crops like the denoise serve path's default; set false for
    pre-scaled data AND serve with ``normalize: "none"`` — the two sides
    must share one intensity space), the standard training/observability
    params of
    ``train_unet2d`` (steps, batch_size, learning_rate, grad_accum,
    remat, lr_*, holdout_every, keep_best, early_stop_patience,
    ema_decay, data_parallel, resume), and the architecture params
    (depth, base_features — default: the ``n2v_denoise`` preset's
    depth-3 net). Registers the model as kind ``n2v`` (served by the
    ``denoise`` pipeline).

    Masking variants: ``mask_mode: "median"`` uses the N2V2 window-median
    manipulation (fewer checkerboard artifacts on smooth signal);
    ``struct_axis: "x"|"y"`` (+ ``"z"`` for volumes) with ``struct_span``
    (default 4) enables structN2V masking for noise CORRELATED along one
    axis — scan-line stripes, detector row noise — which plain N2V
    cannot remove (it reads the noise off the correlated neighbors).
    The two compose; the holdout metric scores under the same masking.

    VOLUMETRIC (``dims: 3``): input is ONE volume-sequence entry
    (dir/glob of per-timepoint z-stacks, or a single file — with the
    ``z`` pages-per-volume param for T·Z-page files); random 3D
    ``patch`` crops (default [8, 64, 64]) from every timepoint,
    single-channel. The neighbor window is z-anisotropic: ``radius``
    covers the two in-plane axes, ``radius_z`` (default 2; 0 = strictly
    in-plane substitutes) the axial one.
    """
    import glob as glob_lib

    import jax

    from sequitr_tpu.data import records as records_lib
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.models import unet
    from sequitr_tpu.models import zoo
    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    p = job.params
    dims = int(p.get("dims", 2))
    if dims not in (2, 3):
        raise jobs_lib.JobError(f"train_n2v needs dims 2 or 3, got {dims}")
    s2d = int(p.get("space_to_depth", 1))
    if dims == 3 and s2d != 1:
        raise jobs_lib.JobError(
            "space_to_depth is a 2D-only rearrangement (volumes train "
            "without it)"
        )

    # ---- record shards: build once, reuse on resume/requeue ----
    rec_dir = os.path.join(job.output, "records")
    shard_paths = sorted(glob_lib.glob(os.path.join(rec_dir, "*.tfrecord")))
    if not shard_paths:
        paths = _resolve_inputs(job)
        if dims == 3:
            # one entry = a volume sequence (dir/glob/file, optional ``z``
            # pages per volume) — every timepoint contributes crops.
            # Single-channel: multi-fluorophore volumes denoise per channel
            # (one job each), keeping the blind-spot geometry simple.
            from sequitr_tpu.data.source import VolumeSequence

            if len(paths) != 1:
                raise jobs_lib.JobError(
                    "train_n2v dims=3 takes ONE volume-sequence entry "
                    f"(got {len(paths)}); denoise channels as separate jobs"
                )
            try:
                source = VolumeSequence(paths[0], z=_parse_z_pages(job))
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
        else:
            try:
                source = FrameSource(paths=paths)
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
        default_patch = (64, 64) if dims == 2 else (8, 64, 64)
        patch = tuple(int(v) for v in p.get("patch", default_patch))
        if len(patch) != dims or any(
            ps > s for s, ps in zip(source.spatial, patch)
        ):
            source.close()
            raise jobs_lib.JobError(
                f"patch {patch} must be {dims} axes and fit the "
                f"{'volumes' if dims == 3 else 'frames'} {source.spatial}"
            )
        n_crops = int(p.get("patches_per_frame", 4))
        p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))
        # training records and the denoise serving pass MUST live in the
        # same intensity space: the default normalizes crops per frame
        # (matching the serve path's default percentile normalize);
        # ``normalize: false`` (or "none") trains in the raw scale — use
        # it for pre-scaled data, TOGETHER with ``normalize: "none"`` on
        # the denoise job, or the net sees a scale it never trained on.
        norm_rec = p.get("normalize", True)
        norm_rec = bool(norm_rec) and norm_rec != "none"
        rng = np.random.default_rng(int(p.get("seed", 0)))
        n_frames = len(source)

        read = source.volume if dims == 3 else source.frame

        def gen_payloads():
            with source:
                for t in jobs_lib.track(
                    job, range(n_frames), total=n_frames, phase="records"
                ):
                    img = np.asarray(read(t), dtype=np.float32)
                    if norm_rec:
                        # percentiles over the spatial axes only (2D
                        # multi-channel frames normalize per channel)
                        axes = tuple(range(dims))
                        lo = np.percentile(img, p_lo, axis=axes, keepdims=True)
                        hi = np.percentile(img, p_hi, axis=axes, keepdims=True)
                        img = np.clip(
                            (img - lo) / np.maximum(hi - lo, 1e-8), 0.0, 1.0
                        ).astype(np.float32)
                    if dims == 3:
                        # explicit channel axis: a bare (Z, H, W) payload
                        # would decode as a 2D multi-channel (H, W, C)
                        img = img[..., None]
                    for _ in range(n_crops):
                        sl = tuple(
                            slice(
                                st := int(rng.integers(0, s - ps + 1)),
                                st + ps,
                            )
                            for s, ps in zip(img.shape[:dims], patch)
                        )
                        yield fit_lib.encode_image_example(img[sl])

        os.makedirs(rec_dir, exist_ok=True)
        shard_paths = records_lib.write_shards(
            os.path.join(rec_dir, "train"), gen_payloads(),
            shard_size=int(p.get("shard_size", 128)),
        )
        n_channels = 1 if dims == 3 else source.n_channels
    else:
        # resumed job: channel count comes from the shards themselves
        first = next(records_lib.read_records(shard_paths[0]), None)
        if first is None:
            raise jobs_lib.JobError(f"job {job.id}: empty record shards in {rec_dir}")
        shape = fit_lib._decode_image(first)["image"].shape
        n_channels = shape[-1]

    # ---- architecture: the n2v preset resized to the data's channels ----
    import jax.numpy as jnp

    base = zoo.get("n2v_denoise")
    cfg = dataclasses.replace(
        base,
        in_channels=n_channels,
        num_classes=n_channels,  # regression: predict every input channel
        dims=dims,
        depth=int(p.get("depth", base.depth)),
        # the fast-denoiser recipe (the n2v_denoise_fast preset's shape):
        # space_to_depth 2 with doubled base width serves ~1.5-2x the
        # frames/sec at 1024^2 and trains DIRECTLY on the same noisy
        # data — the blind-spot loss needs no distillation teacher
        base_features=int(
            p.get("base_features", 64 if s2d > 1 else base.base_features)
        ),
        space_to_depth=s2d,
        norm=p.get("norm", base.norm),
        compute_dtype=jnp.dtype(p.get("compute_dtype", "bfloat16")),
    )
    steps = int(p.get("steps", 1000))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 4e-4)),
        augment=bool(p.get("augment", True)),
        grad_accum=int(p.get("grad_accum", 1)),
        remat=bool(p.get("remat", False)),
        lr_schedule=str(p.get("lr_schedule", "constant")),
        lr_warmup_steps=int(p.get("lr_warmup_steps", 0)),
        lr_decay_steps=int(
            p.get("lr_decay_steps",
                  max(1, steps - int(p.get("lr_warmup_steps", 0))))
        ),
        lr_end_factor=float(p.get("lr_end_factor", 0.01)),
        polyphase=_polyphase_train_param(p, cfg),
    )
    fc = fit_lib.FitConfig(
        steps=steps,
        batch_size=int(p.get("batch_size", 16)),
        checkpoint_every=int(p.get("checkpoint_every", 500)),
        log_every=int(p.get("log_every", 50)),
        holdout_every=int(p.get("holdout_every", 0)),
        eval_every=int(p.get("eval_every", 0)),
        metrics_path=os.path.join(job.output, "metrics.jsonl"),
        dump_eval_images=bool(p.get("dump_eval_images", False)),
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
        keep_best_metric=(
            str(p.get("keep_best_metric", "eval_psnr_masked"))
            if p.get("keep_best") or _parse_patience(p)
            else ""
        ),
        early_stop_patience=_parse_patience(p),
        ema_decay=_parse_ema_decay(p),
    )
    if fc.keep_best_metric and not fc.holdout_every:
        raise jobs_lib.JobError(
            "keep_best/early_stop_patience requires holdout_every > 0 "
            "(no eval metric to track)"
        )
    ckpt_dir = os.path.join(job.output, "ckpts")
    init_state = None
    ckpt = fit_lib.latest_checkpoint(ckpt_dir) if p.get("resume", True) else None
    if ckpt:
        template = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        init_state = train_lib.restore_checkpoint(ckpt, template)
    radius = int(p.get("radius", 5))
    if dims == 3:
        # anisotropic neighbor window: confocal/light-sheet stacks sample
        # z far coarser than xy, so the z radius defaults small (and
        # radius_z: 0 keeps substitutes strictly in-plane)
        radius = (int(p.get("radius_z", 2)), radius, radius)
    mask_mode = str(p.get("mask_mode", "uniform"))
    if mask_mode not in ("uniform", "median"):
        raise jobs_lib.JobError(
            f"mask_mode={mask_mode!r} must be 'uniform' (Noise2Void "
            "random-neighbor) or 'median' (the N2V2 manipulation)"
        )
    struct = None
    if p.get("struct_axis") is not None:
        # structN2V: noise correlated along one axis (scan-line stripes)
        # — the whole +/-struct_span segment is masked, substitutes come
        # strictly off the line
        axes = {"y": dims - 2, "x": dims - 1}
        if dims == 3:
            axes["z"] = 0
        sa = str(p.get("struct_axis"))
        if sa not in axes:
            raise jobs_lib.JobError(
                f"struct_axis={sa!r} must be one of {sorted(axes)} "
                f"for dims={dims}"
            )
        span = int(p.get("struct_span", 4))
        if span < 1:
            raise jobs_lib.JobError(
                f"struct_span={span} must be >= 1 (pixels each side of "
                "the masked center along the correlated axis)"
            )
        struct = (axes[sa], span)
    elif p.get("struct_span") is not None:
        raise jobs_lib.JobError(
            "struct_span without struct_axis: say WHICH axis the noise "
            "is correlated along ('x', 'y'" + (", 'z'" if dims == 3 else "")
            + ")"
        )
    rep = jobs_lib.ProgressReporter(job, steps, phase="steps", raise_on_cancel=False)
    try:
        state = fit_lib.fit_n2v(
            cfg, tc, fc, shard_paths, ckpt_dir=ckpt_dir, init_state=init_state,
            mesh=_train_mesh(p, fc.batch_size),
            mask_frac=float(p.get("mask_frac", 0.005)),
            radius=radius,
            mask_mode=mask_mode,
            struct=struct,
            should_stop=lambda: jobs_lib.cancel_requested(job),
            progress=lambda s, _t: rep.step(s),
        )
    except fit_lib.TrainingCancelled as e:
        raise jobs_lib.JobCancelled(str(e))
    except ValueError as e:
        # bad mask_frac/radius/keep_best_metric are deterministic
        raise jobs_lib.JobError(str(e))
    rep.finish()
    best_path = os.path.join(ckpt_dir, "best")
    used_best = fc.keep_best_metric and os.path.isdir(best_path)
    if used_best:
        state = train_lib.restore_checkpoint(best_path, state)
    reg_params = _ema_or_raw_params(ckpt_dir, fc, state, used_best)
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "n2v", cfg,
        reg_params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path,
            "shards": os.path.join(rec_dir, "train-*.tfrecord")}
