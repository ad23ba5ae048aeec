"""Semantic-segmentation pipelines: U-Net serving, evaluation, parity.

Split out of ``server.py`` (round-5 verdict item 4): ``segmentation_unet2d``
/ ``segmentation_unet3d`` tiled serving (DP / spatial / hybrid sharding,
localization export), ``evaluate_unet2d`` / ``evaluate_unet3d`` scoring, and
``parity_check`` (registered model vs an independent torch/keras
re-derivation on identical weights). Registration happens at import time
via the shared registry in ``sequitr_tpu.server.server``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.jobs import Job
from sequitr_tpu.server.server import (
    _require_polyphase_model,
    _append_writer,
    _apply_frame_range,
    _apply_roi,
    _expand_inputs_entry,
    _normalized_entropy,
    _out_compression,
    _parse_eval_ignore,
    _parse_z_pages,
    _read_stack_or_fail,
    _require_model,
    _resolve_inputs,
    _run_frames,
    _spatial_ways,
    _tile_config,
    register,
)

import logging
log = logging.getLogger("sequitr_tpu.server")

@register("segmentation_unet2d")
def segmentation_unet2d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Tiled UNet2D segmentation of a (T, H, W) TIFF stack.

    params: model (name under models_dir), patch, overlap, window,
    normalize, p_lo, p_hi, save_probs (bool), localize (bool, default True),
    min_area.
    Outputs: labels.tif (+ probs.tif), objects.h5 (btrack layout).
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource

    paths = _resolve_inputs(job)
    try:
        # lazy per-frame ingest: host memory stays O(frames in flight), so a
        # timelapse larger than host RAM serves end-to-end (SURVEY.md §7(e))
        source = FrameSource(paths=paths)
    except ValueError as e:
        # unreadable input is deterministic — fail fast, never retry
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))

    cfg, params, state = _require_model(job, config, "unet")
    if cfg.in_channels != source.n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {source.n_channels} input stack(s)"
        )
    tc = _tile_config(
        job.params, dims=2,
        frame_spatial=source.spatial, min_multiple=cfg.min_input_multiple,
        allow_polyphase=True,
    )
    if tc.polyphase:
        # the polyphase forward covers the plain serving topology;
        # reject the rest loudly rather than silently serving the
        # standard graph (models.polyphase docstring has the ledger)
        _require_polyphase_model(cfg)
        if job.params.get("spatial_parallel"):
            raise jobs_lib.JobError(
                "polyphase + spatial_parallel is not supported; the "
                "spatial path runs its own halo-exchange forward"
            )

    from sequitr_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    n_frames = len(source)
    frame_offset = source.frame_offset
    tables = []  # compact per-frame localization tables (t order)
    # localization is host CPU work; frame fetches are relay/PCIe IO waits.
    # Run localization on one worker thread so frame t's CCL overlaps frame
    # t+1's D2H instead of serializing after it (localize_s below is the
    # NON-overlapped wait at the end of the loop). Output TIFFs append page
    # by page as results arrive — encoding overlaps inference and no output
    # stack is ever whole in RAM.
    from concurrent.futures import ThreadPoolExecutor

    from collections import deque

    do_localize = job.params.get("localize", True)
    save_probs = bool(job.params.get("save_probs"))
    min_area = int(job.params.get("min_area", 1))
    # distance-transform watershed so abutting cells localize as separate
    # objects (localize.split_touching_instances)
    split_touching = bool(job.params.get("split_touching"))
    min_distance = int(job.params.get("min_distance", 5))
    labels_path = os.path.join(job.output, "labels.tif")
    probs_path = os.path.join(job.output, "probs.tif")
    # bounded: each pending future pins its frame's label + intensity
    # arrays, so an unbounded backlog would quietly re-buffer the stack
    futures: deque = deque()
    max_pending = 8
    n_classes = cfg.num_classes
    px = float(n_frames) * np.prod(source.spatial)
    comp = _out_compression(job)
    labels_w = _append_writer(labels_path, px * 2, comp)
    probs_w = (
        _append_writer(
            probs_path,
            px * n_classes * np.dtype(tc.probs_dtype).itemsize,
            comp,
        )
        if save_probs else None
    )
    # per-pixel predictive uncertainty: normalized softmax entropy
    # -sum(p log p)/log(K) in [0, 1] (1 = uniform). Computed on host from
    # the probs the graph already returns - the QC map reviewers threshold
    # to find frames/regions the model is unsure about.
    save_entropy = bool(job.params.get("save_entropy"))
    if save_entropy and n_classes < 2:
        # reject unsupported combos loudly (cf. tta + spatial_parallel):
        # entropy of a single class is identically 0 and log(K)=0
        raise jobs_lib.JobError(
            "save_entropy requires a model with num_classes >= 2"
        )
    entropy_w = (
        _append_writer(
            os.path.join(job.output, "entropy.tif"), px * 4, comp
        )
        if save_entropy else None
    )
    # live progress + cooperative cancellation, checked once per frame
    # (rate-limited progress.json; JobCancelled aborts the partial writers)
    rep = jobs_lib.ProgressReporter(job, n_frames)
    try:
        with ThreadPoolExecutor(max_workers=1) as pool, source:
            # the generator dispatches lazily: each next() is the dispatch
            # (+ H2D) work, each np.asarray the D2H result wait
            results = _run_frames(cfg, tc, params, state, source, job)
            for t in range(n_frames):
                with timer.phase("infer"):
                    result = next(results)
                with timer.phase("fetch"):
                    # uint16 on device in the default path; the spatial-
                    # parallel shard_map path still emits int32 — cast here
                    labels_np = np.asarray(result.labels).astype(
                        np.uint16, copy=False
                    )
                with timer.phase("write"):
                    labels_w.append(labels_np)
                if probs_w is not None or entropy_w is not None:
                    with timer.phase("fetch"):
                        # native dtype: float16 pages stay half-size on the
                        # wire AND on disk when probs_dtype requests it
                        probs_np = np.asarray(result.probs)
                    with timer.phase("write"):
                        if probs_w is not None:
                            # softmax label maps, frame-major (the
                            # reference's output contract):
                            # page t*K + k = frame t, class k
                            for k in range(n_classes):
                                probs_w.append(probs_np[..., k])
                        if entropy_w is not None:
                            entropy_w.append(
                                _normalized_entropy(probs_np, n_classes)
                            )
                if do_localize:
                    # per-object mean intensity; channel-mean if multi-channel
                    inten = source.frame(t)
                    if inten.ndim == 3:
                        inten = inten.mean(axis=-1)
                    futures.append(
                        pool.submit(
                            loc_lib.localize_frame_table, labels_np,
                            # ABSOLUTE frame index, so frame_range segments
                            # splice back into full-timelapse tracks
                            t=t + source.frame_offset,
                            intensity=inten, min_area=min_area,
                            n_classes=n_classes,
                            split_touching=split_touching,
                            min_distance=min_distance,
                        )
                    )
                    while len(futures) > max_pending:
                        with timer.phase("localize"):
                            tables.append(futures.popleft().result())
                rep.step()
            with timer.phase("localize"):
                while futures:
                    tables.append(futures.popleft().result())
            rep.finish()
    except BaseException:
        labels_w.abort()
        if probs_w is not None:
            probs_w.abort()
        if entropy_w is not None:
            entropy_w.abort()
        raise
    labels_w.close()
    if probs_w is not None:
        probs_w.close()
    if entropy_w is not None:
        entropy_w.close()

    outputs: Dict[str, str] = {}
    n_objects = sum(len(tb) for tb in tables)
    metrics = dict(timer.summary(), n_frames=n_frames, n_objects=n_objects)
    # dispatch is async: throughput = frames over dispatch + result-fetch time
    total_s = sum(timer._acc.get(k, 0.0) for k in ("infer", "fetch"))
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    outputs["metrics"] = json.dumps(metrics)
    outputs["labels"] = labels_path
    if save_probs:
        outputs["probs"] = probs_path
        outputs["probs_layout"] = (
            f"pages=(T={n_frames})*(K={n_classes}), frame-major"
        )
    if entropy_w is not None:
        outputs["entropy"] = os.path.join(job.output, "entropy.tif")
    if do_localize:
        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=frame_offset + n_frames
        )
        outputs["objects"] = h5_path
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, tables)
            outputs["objects_csv"] = csv_path
    return outputs


@register("segmentation_unet3d")
def segmentation_unet3d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Tiled UNet3D segmentation of a (Z, H, W) volume (BASELINE config #4).

    Same output contract as the 2D pipeline: labels.tif (uint16), optional
    per-class probs.tif (``save_probs``), and btrack objects.h5 with 3D
    centroids (``localize``, default True; SURVEY.md §3.5).

    TIMELAPSES OF VOLUMES (3D + time): a directory/glob input entry (one
    z-stack file per timepoint) or a single file with the ``z``
    pages-per-volume param serves every timepoint through one cached
    graph — per-timepoint ``labels_t{t:04d}.tif`` (+ probs/entropy) and
    ONE ``objects.h5`` whose map covers all timepoints, ready for 3D
    btrack tracking (or the built-in ``track_objects``). ``frame_range``
    selects timepoints; streamed one volume at a time, cancellable.
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.pipeline import infer as infer_lib

    if job.params.get("roi") is not None:
        raise jobs_lib.JobError(
            "roi serving is 2D-only (crop the volume upstream)"
        )
    # one TIFF per channel, stacked on the trailing axis — the same
    # multi-fluorophore convention as the 2D pipeline (SURVEY.md §2)
    paths = _resolve_inputs(job)
    z_param = job.params.get("z")
    # a dir/glob entry IS the timelapse convention even when it expands
    # to a single file (a 1-timepoint sequence, not a bare volume file)
    if z_param is not None or any(
        _expand_inputs_entry(p_) != [p_] for p_ in paths
    ):
        return _segment_volume_timelapse(job, config, paths, _parse_z_pages(job))
    vols = []
    for p_ in paths:
        v = _read_stack_or_fail(job, p_)
        if v.ndim != 3:
            raise jobs_lib.JobError(
                f"unet3d expects (Z, H, W) stacks, got {v.shape} from {p_}"
            )
        vols.append(v)
    if len({v.shape for v in vols}) != 1:
        raise jobs_lib.JobError(
            f"channel stacks disagree in shape: {[v.shape for v in vols]}"
        )
    vol = np.stack(vols, axis=-1) if len(vols) > 1 else vols[0]
    vol_spatial = vol.shape[:3]

    cfg, params, state = _require_model(job, config, "unet")
    if cfg.dims != 3:
        raise jobs_lib.JobError(f"job {job.id}: model is {cfg.dims}D, expected 3D")
    n_ch = vol.shape[-1] if vol.ndim == 4 else 1
    if cfg.in_channels != n_ch:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), got {n_ch} input stack(s)"
        )
    tc = _tile_config(
        job.params, dims=3,
        frame_spatial=vol_spatial, min_multiple=cfg.min_input_multiple,
        allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg)
        if job.params.get("spatial_parallel"):
            raise jobs_lib.JobError(
                "polyphase + spatial_parallel is not supported; the "
                "spatial path runs its own halo-exchange forward"
            )
    from sequitr_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    t0 = time.time()
    sp = job.params.get("spatial_parallel")
    import jax

    if sp and jax.device_count() > 1:
        # volume Z-sharded across chips (plane halo exchange, exact):
        # for z-stacks whose activations exceed one chip's HBM
        import jax.numpy as jnp

        from sequitr_tpu import parallel
        from sequitr_tpu.parallel import spatial as spatial_lib

        n_dev = jax.device_count()
        s_ways = _spatial_ways(sp, n_dev, divide=False, tc=tc)
        mesh = parallel.make_mesh(s_ways)

        def norm(v):
            vv = jnp.asarray(v)
            if vv.ndim == 3:
                return infer_lib._normalize(vv[..., None], tc)[..., 0]
            return infer_lib._normalize(vv, tc)

        try:
            sp_fn = spatial_lib.spatial_unet3d_infer(
                cfg, params, state, mesh, tuple(vol_spatial),
                probs_dtype=tc.probs_dtype, labels_dtype=tc.labels_dtype,
            )
        except (ValueError, NotImplementedError) as e:
            # bad shape/config for sharding is deterministic — no retry
            raise jobs_lib.JobError(str(e))
        with timer.phase("infer"):
            probs, labels = sp_fn(params, state, jax.jit(norm)(vol))
    else:
        fn = infer_lib.cached_frame_inferrer(cfg, tc, tuple(vol_spatial))
        with timer.phase("infer"):
            probs, labels = fn(params, state, vol)
    with timer.phase("fetch"):
        labels_np = np.asarray(labels)

    outputs: Dict[str, str] = {}
    comp = _out_compression(job)
    labels_path = os.path.join(job.output, "labels.tif")
    tiff.write_stack(labels_path, labels_np.astype(np.uint16), compression=comp)
    outputs["labels"] = labels_path
    if job.params.get("save_entropy"):
        if cfg.num_classes < 2:
            raise jobs_lib.JobError(
                "save_entropy requires a model with num_classes >= 2"
            )
        # normalized softmax entropy per voxel (see the 2D path)
        ent = _normalized_entropy(np.asarray(probs), cfg.num_classes)
        entropy_path = os.path.join(job.output, "entropy.tif")
        tiff.write_stack(entropy_path, ent, compression=comp)
        outputs["entropy"] = entropy_path
    if job.params.get("save_probs"):
        probs_np = np.asarray(probs)  # (Z, H, W, K), tc.probs_dtype
        planes = np.moveaxis(probs_np, -1, 1).reshape(-1, *probs_np.shape[1:3])
        probs_path = os.path.join(job.output, "probs.tif")
        tiff.write_stack(probs_path, planes, compression=comp)
        outputs["probs"] = probs_path
        outputs["probs_layout"] = (
            f"pages=(Z={vol.shape[0]})*(K={probs_np.shape[-1]}), plane-major"
        )
    if job.params.get("localize", True):
        with timer.phase("localize"):
            # per-object mean intensity; channel-mean for multi-channel
            inten = vol.mean(axis=-1) if vol.ndim == 4 else vol
            objects = loc_lib.localize_volume(
                labels_np, t=int(job.params.get("t", 0)), intensity=inten,
                min_area=int(job.params.get("min_area", 1)),
                split_touching=bool(job.params.get("split_touching")),
                min_distance=int(job.params.get("min_distance", 5)),
            )
            h5_path = os.path.join(job.output, "objects.h5")
            # a volume is one timepoint (t param); map has that single row
            loc_lib.export_btrack_h5(
                h5_path, objects, n_frames=int(job.params.get("t", 0)) + 1
            )
        outputs["objects"] = h5_path
        outputs["n_objects"] = str(len(objects))
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, objects)
            outputs["objects_csv"] = csv_path
    total_s = time.time() - t0
    mvox = float(np.prod(vol_spatial)) / 1e6
    outputs["metrics"] = json.dumps(
        dict(
            timer.summary(), total_s=round(total_s, 4),
            mvox_per_sec=round(mvox / max(total_s, 1e-9), 3),
        )
    )
    return outputs


@register("evaluate_unet2d")
def evaluate_unet2d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Score a registered model against ground-truth labels.

    The post-training counterpart of the train jobs' holdout eval: segment
    a stack with the named model and compare to provided label maps.
    input: [image.tif, ..., labels.tif] — channel stack(s) following the
    ``segmentation_unet2d`` convention (one TIFF per channel), LAST path
    is the ground-truth labels. params: model, the usual tiling params,
    ``per_frame: true`` for a per-frame mIoU series, ``save_labels: true``
    to also write the predicted label maps, ``ignore_label`` (sparse
    ground truth: pixels carrying this value are excluded from every
    metric — intersection, union AND accuracy denominators). Outputs:
    ``metrics`` JSON with per-class IoU, mIoU, dice and pixel accuracy
    over the whole stack.
    """
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import losses

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            f"job {job.id}: need [image(s)..., labels], got {len(paths)} input(s)"
        )
    try:
        source = FrameSource(paths=paths[:-1])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_frame_range(job, source)
    # ground-truth labels stream lazily too (int dtype preserved); eager
    # fallback for layouts the lazy reader cannot parse
    t_reader = None
    try:
        t_reader = tiff.TiffReader(paths[-1])
        t_shape = t_reader.shape
        read_truth = lambda i: np.asarray(
            t_reader.read_frame(i), dtype=np.int64
        )
    except ValueError:
        arr = _read_stack_or_fail(job, paths[-1], dtype=None).astype(np.int64)
        if arr.ndim == 2:
            arr = arr[None]
        t_shape = arr.shape
        read_truth = lambda i: arr[i]
    # truth must cover the UNDERLYING stack; comparisons below index it
    # at absolute frame positions (frame_range offsets apply)
    shape = (source.frame_offset + len(source),) + source.spatial
    if tuple(t_shape)[1:] != source.spatial or t_shape[0] < shape[0]:
        raise jobs_lib.JobError(
            f"image/label shape mismatch: need >= {shape}, got {tuple(t_shape)}"
        )

    cfg, params, state = _require_model(job, config, "unet")
    if cfg.dims != 2:
        raise jobs_lib.JobError(f"job {job.id}: model is {cfg.dims}D, expected 2D")
    if cfg.in_channels != source.n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {source.n_channels} input stack(s)"
        )
    tc = _tile_config(
        job.params, dims=2,
        frame_spatial=source.spatial, min_multiple=cfg.min_input_multiple,
    )
    k = cfg.num_classes
    ignore = _parse_eval_ignore(job, k)
    # streaming evaluation: one (K+1, K) confusion matrix accumulates per
    # frame — identical metrics to the buffered whole-stack form without
    # holding every predicted label map in RAM
    cm = np.zeros((k + 1, k), dtype=np.int64)
    per_frame = [] if job.params.get("per_frame") else None
    n_frames = len(source)
    labels_w = (
        _append_writer(
            os.path.join(job.output, "labels.tif"),
            float(n_frames) * np.prod(source.spatial) * 2,
            _out_compression(job),
        )
        if job.params.get("save_labels") else None
    )
    rep = jobs_lib.ProgressReporter(job, n_frames)
    try:
        with source:
            results = _run_frames(cfg, tc, params, state, source, job)
            for t in range(n_frames):
                pred = np.asarray(next(results).labels)
                truth_t = read_truth(t + source.frame_offset)
                if ignore is not None:
                    keep_px = truth_t != ignore
                    fcm = losses.confusion_matrix_np(
                        pred[keep_px], truth_t[keep_px], k
                    )
                else:
                    fcm = losses.confusion_matrix_np(pred, truth_t, k)
                cm += fcm
                if per_frame is not None:
                    if fcm.sum() == 0:
                        # a wholly-ignored frame has NO score — null, not
                        # a vacuous 1.0 a reader would mistake for perfect
                        per_frame.append(None)
                    else:
                        f_ious, _, _ = losses.metrics_from_confusion(fcm)
                        per_frame.append(round(float(np.mean(f_ious)), 6))
                if labels_w is not None:
                    labels_w.append(pred.astype(np.uint16, copy=False))
                rep.step()
            rep.finish()
    except BaseException:
        if labels_w is not None:
            labels_w.abort()
        raise
    finally:
        if t_reader is not None:
            t_reader.close()

    ious, dices, accuracy = losses.metrics_from_confusion(cm)
    if cm.sum() == 0:
        accuracy = 1.0  # vacuous, matching miou and the 3D evaluator
    metrics = {
        "miou": round(float(np.mean(ious)), 6),
        "pixel_accuracy": round(accuracy, 6),
        "n_frames": n_frames,
    }
    for i in range(k):
        metrics[f"iou_{i}"] = round(float(ious[i]), 6)
        metrics[f"dice_{i}"] = round(float(dices[i]), 6)
    if per_frame is not None:
        metrics["per_frame_miou"] = per_frame

    outputs: Dict[str, str] = {"metrics": json.dumps(metrics)}
    if labels_w is not None:
        labels_w.close()
        outputs["labels"] = os.path.join(job.output, "labels.tif")
    return outputs


@register("parity_check")
def parity_check(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Validate a registered U-Net against an independent re-derivation.

    The operational end of the migration story: after ``import-model``
    lands a converted TF-1.x checkpoint, this job runs identical weights
    through our jax path AND a reference implementation in another
    framework (``reference: "torch"`` default, or ``"keras"``) on random
    probe frames, reporting per-pixel deltas. params: model, ``reference``,
    ``spatial`` ([H, W], default [64, 64]; must divide the model's pooling
    multiple), ``n_probes`` (default 4), ``seed``. Outputs: metrics JSON
    with max/mean |dlogits| and label agreement. Fails (deterministically)
    if max |dlogits| exceeds ``tolerance`` (default 1e-3).
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.models import unet

    kind, cfg, params, state = _require_model(job, config, expect_kind=None)
    if kind == "gan":
        return _parity_check_gan(job, cfg, params, state)
    p = job.params
    ref = str(p.get("reference", "torch"))
    spatial = tuple(int(v) for v in p.get("spatial", (64, 64)))
    if len(spatial) != cfg.dims:
        raise jobs_lib.JobError(
            f"spatial {spatial} must have {cfg.dims} axes for this model"
        )
    if any(s % cfg.min_input_multiple for s in spatial):
        raise jobs_lib.JobError(
            f"every spatial axis of {spatial} must be divisible by "
            f"{cfg.min_input_multiple}"
        )
    n_probes = int(p.get("n_probes", 4))
    if n_probes < 1:
        raise jobs_lib.JobError(f"n_probes must be >= 1, got {n_probes}")
    tolerance = float(p.get("tolerance", 1e-3))
    rng = np.random.default_rng(int(p.get("seed", 0)))
    probes = rng.normal(
        size=(n_probes,) + spatial + (cfg.in_channels,)
    ).astype(np.float32)

    # f32 on both sides: this validates WEIGHT conversion, not bf16 drift
    import dataclasses as dc

    cfg32 = dc.replace(cfg, compute_dtype=jnp.dtype("float32"))
    ours, _ = unet.apply(cfg32, params, state, jnp.asarray(probes), train=False)
    ours = np.asarray(ours, dtype=np.float32)

    try:
        if ref == "torch":
            from sequitr_tpu.models import torch_reference

            model = torch_reference.build_torch_unet(cfg32)
            torch_reference.inject_weights_torch(model, cfg32, params, state)
            theirs = torch_reference.torch_forward(model, probes)
        elif ref == "keras":
            from sequitr_tpu.models import tf_reference

            model = tf_reference.build_tf_unet(cfg32, spatial)
            tf_reference.inject_weights(model, cfg32, params, state)
            theirs = tf_reference.tf_forward(model, probes)
        else:
            raise jobs_lib.JobError(
                f"reference={ref!r} must be 'torch' or 'keras'"
            )
    except (NotImplementedError, ImportError) as e:
        raise jobs_lib.JobError(f"reference {ref!r} unavailable: {e}")

    d = np.abs(ours - theirs)
    agree = float(
        (np.argmax(ours, -1) == np.argmax(theirs, -1)).mean()
    )
    metrics = {
        "reference": ref,
        "max_abs_dlogits": round(float(d.max()), 8),
        "mean_abs_dlogits": round(float(d.mean()), 8),
        "label_agreement": round(agree, 6),
        "n_probes": n_probes,
        "spatial": list(spatial),
    }
    outputs = {"metrics": json.dumps(metrics)}
    if float(d.max()) > tolerance:
        raise jobs_lib.JobError(
            f"parity FAILED: max |dlogits| {float(d.max()):.3e} > "
            f"tolerance {tolerance:.1e} vs the {ref} reference "
            f"(metrics: {json.dumps(metrics)})"
        )
    return outputs


def _parity_check_gan(job: Job, cfg, params, state) -> Dict[str, str]:
    """GAN branch of ``parity_check``: generator AND discriminator vs an
    independent re-derivation (torch or keras) on identical weights."""
    import dataclasses as dc

    import jax.numpy as jnp

    from sequitr_tpu.models import gan as gan_lib
    from sequitr_tpu.models import torch_reference

    p = job.params
    ref = str(p.get("reference", "torch"))
    if ref not in ("torch", "keras"):
        raise jobs_lib.JobError(
            f"reference={ref!r} must be 'torch' or 'keras'"
        )
    spatial = tuple(int(v) for v in p.get("spatial", (64, 64)))
    if len(spatial) != 2:
        raise jobs_lib.JobError(
            f"spatial {spatial} must be [H, W] (the GAN family is 2D)"
        )
    if any(s % cfg.min_input_multiple for s in spatial):
        raise jobs_lib.JobError(
            f"every spatial axis of {spatial} must be divisible by "
            f"{cfg.min_input_multiple}"
        )
    n_probes = int(p.get("n_probes", 4))
    if n_probes < 1:
        raise jobs_lib.JobError(f"n_probes must be >= 1, got {n_probes}")
    tolerance = float(p.get("tolerance", 1e-3))
    rng = np.random.default_rng(int(p.get("seed", 0)))
    cfg32 = dc.replace(cfg, compute_dtype=jnp.dtype("float32"))
    x = rng.normal(size=(n_probes,) + spatial + (cfg.in_channels,)).astype(
        np.float32
    )
    y = rng.normal(size=(n_probes,) + spatial + (cfg.out_channels,)).astype(
        np.float32
    )

    try:
        ours_g, _ = gan_lib.generator_apply(cfg32, params, state, jnp.asarray(x))
        ours_g = np.asarray(ours_g, dtype=np.float32)
        ours_d = np.asarray(
            gan_lib.discriminator_apply(
                cfg32, params, jnp.asarray(x), jnp.asarray(y)
            ),
            dtype=np.float32,
        )
        pair = np.concatenate([x, y], axis=-1)
        if ref == "torch":
            gen_model = torch_reference.build_torch_unet(cfg32.generator_config)
            torch_reference.inject_weights_torch(
                gen_model, cfg32.generator_config, params["gen"], state["gen"]
            )
            theirs_g = torch_reference.torch_forward(gen_model, x)
            disc_model = torch_reference.build_torch_patchgan(cfg32)
            torch_reference.inject_patchgan_weights_torch(
                disc_model, cfg32, params
            )
            theirs_d = torch_reference.torch_forward(disc_model, pair)
        else:
            from sequitr_tpu.models import tf_reference

            gen_model = tf_reference.build_tf_unet(
                cfg32.generator_config, spatial
            )
            tf_reference.inject_weights(
                gen_model, cfg32.generator_config, params["gen"], state["gen"]
            )
            theirs_g = tf_reference.tf_forward(gen_model, x)
            disc_model = tf_reference.build_tf_patchgan(cfg32, spatial)
            tf_reference.inject_patchgan_weights(disc_model, cfg32, params)
            theirs_d = tf_reference.tf_forward(disc_model, pair)
        if cfg.output_activation == "tanh":
            theirs_g = np.tanh(theirs_g)
        elif cfg.output_activation == "sigmoid":
            theirs_g = 1.0 / (1.0 + np.exp(-theirs_g))
    except (NotImplementedError, ImportError) as e:
        raise jobs_lib.JobError(f"reference {ref!r} unavailable: {e}")

    dg = np.abs(ours_g - theirs_g)
    dd = np.abs(ours_d - theirs_d)
    metrics = {
        "reference": ref,
        "max_abs_dgen": round(float(dg.max()), 8),
        "mean_abs_dgen": round(float(dg.mean()), 8),
        "max_abs_ddisc": round(float(dd.max()), 8),
        "n_probes": n_probes,
        "spatial": list(spatial),
    }
    worst = max(float(dg.max()), float(dd.max()))
    if worst > tolerance:
        raise jobs_lib.JobError(
            f"parity FAILED: max |d| {worst:.3e} > tolerance "
            f"{tolerance:.1e} vs the torch reference "
            f"(metrics: {json.dumps(metrics)})"
        )
    return {"metrics": json.dumps(metrics)}


@register("evaluate_unet3d")
def evaluate_unet3d(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Volumetric counterpart of ``evaluate_unet2d``.

    input: [volume.tif, labels.tif] ((Z, H, W) stacks). params: model,
    3-axis tiling params, ``save_labels``, ``ignore_label`` (sparse
    ground truth excluded from every metric — annotating a few z-planes
    of a volume is the realistic labelling budget). Outputs per-class
    IoU/dice, mIoU and voxel accuracy over the volume.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data import tiff
    from sequitr_tpu.ops import losses
    from sequitr_tpu.pipeline import infer as infer_lib

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            f"job {job.id}: need [volume channel(s)..., labels], "
            f"got {len(paths)} input(s)"
        )
    vols = []
    for p_ in paths[:-1]:
        v = _read_stack_or_fail(job, p_)
        if v.ndim != 3:
            raise jobs_lib.JobError(
                f"unet3d expects (Z, H, W) stacks, got {v.shape} from {p_}"
            )
        vols.append(v)
    if len({v.shape for v in vols}) != 1:
        raise jobs_lib.JobError(
            f"channel stacks disagree in shape: {[v.shape for v in vols]}"
        )
    vol = np.stack(vols, axis=-1) if len(vols) > 1 else vols[0]
    vol_spatial = vol.shape[:3]
    truth = _read_stack_or_fail(job, paths[-1], dtype=None).astype(np.int32)
    if vol_spatial != truth.shape:
        raise jobs_lib.JobError(
            f"volume/label shape mismatch: {vol_spatial} vs {truth.shape}"
        )

    cfg, params, state = _require_model(job, config, "unet")
    if cfg.dims != 3:
        raise jobs_lib.JobError(f"job {job.id}: model is {cfg.dims}D, expected 3D")
    n_ch = vol.shape[-1] if vol.ndim == 4 else 1
    if cfg.in_channels != n_ch:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), got {n_ch} input stack(s)"
        )
    k = cfg.num_classes
    # validate BEFORE the volumetric inference — a bad param must not
    # cost minutes of chip time first
    ignore = _parse_eval_ignore(job, k)
    tc = _tile_config(
        job.params, dims=3,
        frame_spatial=vol_spatial, min_multiple=cfg.min_input_multiple,
    )
    fn = infer_lib.cached_frame_inferrer(cfg, tc, tuple(vol_spatial))
    _, labels = fn(params, state, vol)
    preds = np.asarray(labels).astype(np.int32)
    p_eval, t_eval = preds, truth
    if ignore is not None:
        keep_vx = truth != ignore
        p_eval, t_eval = preds[keep_vx], truth[keep_vx]
    ious = np.asarray(losses.iou(jnp.asarray(p_eval), jnp.asarray(t_eval), k))
    dices = np.asarray(
        losses.dice(jnp.asarray(p_eval), jnp.asarray(t_eval), k)
    )
    metrics = {
        "miou": round(float(np.mean(ious)), 6),
        "voxel_accuracy": round(
            float((p_eval == t_eval).mean()) if p_eval.size else 1.0, 6
        ),
    }
    for i in range(k):
        metrics[f"iou_{i}"] = round(float(ious[i]), 6)
        metrics[f"dice_{i}"] = round(float(dices[i]), 6)

    outputs: Dict[str, str] = {"metrics": json.dumps(metrics)}
    if job.params.get("save_labels"):
        out_path = os.path.join(job.output, "labels.tif")
        tiff.write_stack(
            out_path, preds.astype(np.uint16),
            compression=_out_compression(job),
        )
        outputs["labels"] = out_path
    return outputs


def _segment_volume_timelapse(
    job: Job,
    config: ServerConfiguration,
    paths,
    z: Optional[int],
) -> Dict[str, str]:
    """Timelapse body of ``segmentation_unet3d``: stream a sequence of
    (Z, H, W) volumes (one file per timepoint, or one T*Z-page file with
    ``z``) through ONE cached fused graph; per-timepoint labels (+
    probs/entropy) files and a single btrack objects.h5 spanning every
    timepoint — the 3D+time workflow that feeds volumetric tracking.
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.pipeline import infer as infer_lib
    from sequitr_tpu.utils import PhaseTimer

    try:
        channels = [VolumeSequence(entry, z=z) for entry in paths]
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    shapes = {c.spatial for c in channels}
    counts = {len(c) for c in channels}
    if len(shapes) != 1 or len(counts) != 1:
        raise jobs_lib.JobError(
            f"job {job.id}: channel volume sequences disagree: shapes "
            f"{sorted(shapes)}, timepoints {sorted(counts)}"
        )
    channels = [_apply_frame_range(job, c) for c in channels]
    src = channels[0]
    n_t = len(src)
    zhw = src.spatial

    cfg, params, state = _require_model(job, config, "unet")
    if cfg.dims != 3:
        raise jobs_lib.JobError(
            f"job {job.id}: model is {cfg.dims}D, expected 3D"
        )
    if cfg.in_channels != len(channels):
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), got "
            f"{len(channels)} input sequence(s)"
        )
    if job.params.get("spatial_parallel"):
        raise jobs_lib.JobError(
            "spatial_parallel is single-volume only; serve a volume "
            "timelapse per-timepoint (the per-volume graph is cached "
            "across timepoints) or split the range across workers with "
            "frame_range"
        )
    tc = _tile_config(
        job.params, dims=3,
        frame_spatial=zhw, min_multiple=cfg.min_input_multiple,
        allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg)
    timer = PhaseTimer()
    t0 = time.time()
    comp = _out_compression(job)
    save_probs = bool(job.params.get("save_probs"))
    save_entropy = bool(job.params.get("save_entropy"))
    if save_entropy and cfg.num_classes < 2:
        raise jobs_lib.JobError(
            "save_entropy requires a model with num_classes >= 2"
        )
    do_localize = bool(job.params.get("localize", True))
    min_area = int(job.params.get("min_area", 1))
    split_touching = bool(job.params.get("split_touching"))
    min_distance = int(job.params.get("min_distance", 5))

    fn = infer_lib.cached_frame_inferrer(cfg, tc, tuple(zhw))
    outputs: Dict[str, str] = {}
    all_objects = []
    try:
        for t in jobs_lib.track(job, range(n_t), total=n_t, phase="volumes"):
            with timer.phase("read"):
                try:
                    vols = [ch.volume(t) for ch in channels]
                except ValueError as e:
                    raise jobs_lib.JobError(f"job {job.id}: {e}")
            vol = np.stack(vols, axis=-1) if len(vols) > 1 else vols[0]
            with timer.phase("infer"):
                probs, labels = fn(params, state, vol)
            with timer.phase("fetch"):
                labels_np = np.asarray(labels)
            t_abs = src.frame_offset + t
            if save_probs or save_entropy:
                with timer.phase("fetch"):
                    probs_np = np.asarray(probs)  # ONE D2H for both uses
            with timer.phase("write"):
                lp = os.path.join(job.output, f"labels_t{t_abs:04d}.tif")
                tiff.write_stack(
                    lp, labels_np.astype(np.uint16), compression=comp
                )
                if save_entropy:
                    ent = _normalized_entropy(probs_np, cfg.num_classes)
                    tiff.write_stack(
                        os.path.join(
                            job.output, f"entropy_t{t_abs:04d}.tif"
                        ),
                        ent, compression=comp,
                    )
                if save_probs:
                    planes = np.moveaxis(probs_np, -1, 1).reshape(
                        -1, *probs_np.shape[1:3]
                    )
                    tiff.write_stack(
                        os.path.join(job.output, f"probs_t{t_abs:04d}.tif"),
                        planes, compression=comp,
                    )
            if do_localize:
                with timer.phase("localize"):
                    inten = vol.mean(axis=-1) if vol.ndim == 4 else vol
                    all_objects.extend(
                        loc_lib.localize_volume(
                            labels_np, t=t_abs, intensity=inten,
                            min_area=min_area,
                            split_touching=split_touching,
                            min_distance=min_distance,
                        )
                    )
    finally:
        for ch in channels:
            ch.close()
    # per-timepoint file families: the output keys point at the dir (the
    # same keys every segmentation path sets, so consumers that iterate
    # outputs find them; file naming is labels_t{t:04d}.tif etc.)
    outputs["labels"] = job.output
    if save_entropy:
        outputs["entropy"] = job.output
    if save_probs:
        outputs["probs"] = job.output
        outputs["probs_layout"] = (
            f"per-timepoint probs_t*.tif: pages=(Z={zhw[0]})*"
            f"(K={cfg.num_classes}), plane-major"
        )
    if do_localize:
        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5(
            h5_path, all_objects, n_frames=src.frame_offset + n_t
        )
        outputs["objects"] = h5_path
        outputs["n_objects"] = str(len(all_objects))
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, all_objects)
            outputs["objects_csv"] = csv_path
    total_s = time.time() - t0
    mvox = float(np.prod(zhw)) * n_t / 1e6
    outputs["metrics"] = json.dumps(
        dict(
            timer.summary(), total_s=round(total_s, 4),
            n_volumes=n_t,
            mvox_per_sec=round(mvox / max(total_s, 1e-9), 3),
            volumes_per_sec=round(n_t / max(total_s, 1e-9), 3),
        )
    )
    return outputs
