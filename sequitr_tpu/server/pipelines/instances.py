"""Instance-segmentation pipelines: the two learned touching-cell separators.

Split out of ``server.py`` (round-5 verdict item 4): the flow-field family
(``train_flows`` / ``segment_flows`` / ``evaluate_flows``, 2D + volumetric)
and the star-convex family (``train_stars`` / ``segment_stars`` /
``evaluate_stars``), plus their shared Hungarian instance-AP scoring.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.jobs import Job
from sequitr_tpu.server.pipelines.training import _polyphase_train_param
from sequitr_tpu.server.server import (
    _require_polyphase_model,
    _append_writer,
    _apply_frame_range,
    _apply_roi,
    _dp_chunk_stream,
    _ema_or_raw_params,
    _out_compression,
    _parse_ema_decay,
    _parse_patience,
    _parse_z_pages,
    _read_stack_or_fail,
    _reads_fail_fast,
    _require_model,
    _require_param,
    _resolve_inputs,
    _tile_config,
    _train_mesh,
    register,
    save_model,
)

import logging
log = logging.getLogger("sequitr_tpu.server")

@register("train_flows")
def train_flows(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train a flow-field instance segmenter (Cellpose-style, ops.flows).

    The LEARNED touching-cell separator: per-pixel class maps merge
    abutting same-class cells under connected components (the
    ``split_touching`` watershed is the classical fix); the simulated-
    diffusion flow representation (Stringer et al. 2021) makes the
    contact line explicit — vectors on the two sides of a cell-cell
    boundary point in opposite directions.

    input: [image.tif, ..., instances.tif] — channel stack(s) following
    the segmentation convention, LAST path is the ground-truth INSTANCE
    label stack (each distinct positive value one cell; semantic class
    maps also work when every cell has a unique id). The job computes
    flow targets per FULL frame (``ops.flows.flow_targets`` — cropping
    after diffusion keeps boundary-crossing cells' flows exact), builds
    its own record shards once (random ``patch`` crops, foreground-
    biased, REUSED on resume), then trains a regression U-Net with a
    ``dims + 1``-channel head via ``fit_flows``.

    params: ``model`` (output name, required), ``patch`` (default
    [64, 64]), ``patches_per_frame`` (default 4), ``normalize`` (default
    true: percentile-normalize frames like the serving default; false
    for pre-scaled data AND serve with ``normalize: "none"``), the
    standard training/observability params of ``train_unet2d`` (steps,
    batch_size, learning_rate, grad_accum, remat, lr_*, holdout_every,
    keep_best, early_stop_patience, ema_decay, data_parallel, resume)
    and architecture params (depth, base_features — default the
    ``flows_cells`` preset). Registers the model as kind ``flows``
    (served by ``segment_flows``).

    VOLUMETRIC (``dims: 3``): input = [image volume-sequence entry,
    instance-label volume-sequence entry] (each a dir/glob of
    per-timepoint z-stacks or a single file — the ``z`` pages-per-volume
    param applies to both); 3D diffusion flow targets per full volume,
    random 3D ``patch`` crops (default [8, 64, 64]), single-channel,
    depth default 3; the model serves whole volumes with trilinear flow
    integration (touching nuclei separate in z too).
    """
    import glob as glob_lib

    import jax

    from sequitr_tpu.data import records as records_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.models import zoo
    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    p = job.params
    dims = int(p.get("dims", 2))
    if dims not in (2, 3):
        raise jobs_lib.JobError(f"train_flows needs dims 2 or 3, got {dims}")

    rec_dir = os.path.join(job.output, "records")
    shard_paths = sorted(glob_lib.glob(os.path.join(rec_dir, "*.tfrecord")))
    if not shard_paths:
        paths = _resolve_inputs(job)
        if len(paths) < 2:
            raise jobs_lib.JobError(
                f"job {job.id}: need [image(s)..., instance labels], "
                f"got {len(paths)} input(s)"
            )
        if dims == 3:
            # volume sequences: [images, labels], single-channel
            from sequitr_tpu.data.source import VolumeSequence

            if len(paths) != 2:
                raise jobs_lib.JobError(
                    "train_flows dims=3 takes [image volumes, label "
                    f"volumes] (2 entries), got {len(paths)}"
                )
            z = _parse_z_pages(job)
            try:
                source = VolumeSequence(paths[0], z=z)
                labels_src = VolumeSequence(paths[1], z=z)
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
            if (
                labels_src.spatial != source.spatial
                or len(labels_src) < len(source)
            ):
                source.close()
                labels_src.close()
                raise jobs_lib.JobError(
                    f"image/label volume mismatch: images "
                    f"{(len(source),) + source.spatial}, labels "
                    f"{(len(labels_src),) + labels_src.spatial}"
                )
            read_img = source.volume
            read_lab = lambda t: np.asarray(labels_src.volume(t), np.int64)
        else:
            try:
                source = FrameSource(paths=paths[:-1])
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
            try:
                lab_stack = np.asarray(tiff.read_stack(paths[-1]))
            except (ValueError, OSError) as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read labels: {e}"
                )
            if lab_stack.ndim == 2:
                lab_stack = lab_stack[None]
            if (
                lab_stack.shape[0] < len(source)
                or tuple(lab_stack.shape[1:]) != source.spatial
            ):
                raise jobs_lib.JobError(
                    f"image/label shape mismatch: images "
                    f"{(len(source),) + source.spatial},"
                    f" labels {tuple(lab_stack.shape)}"
                )
            labels_src = None
            read_img = source.frame
            read_lab = lambda t: lab_stack[t].astype(np.int64)
        default_patch = (64, 64) if dims == 2 else (8, 64, 64)
        patch = tuple(int(v) for v in p.get("patch", default_patch))
        if len(patch) != dims or any(
            ps > s for s, ps in zip(source.spatial, patch)
        ):
            source.close()
            if labels_src is not None:
                labels_src.close()
            raise jobs_lib.JobError(
                f"patch {patch} must be {dims} axes and fit the "
                f"{'volumes' if dims == 3 else 'frames'} {source.spatial}"
            )
        n_crops = int(p.get("patches_per_frame", 4))
        p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))
        # record/serve normalization must share one intensity space — the
        # same contract (and same default) as train_n2v/denoise
        norm_rec = p.get("normalize", True)
        norm_rec = bool(norm_rec) and norm_rec != "none"
        rng = np.random.default_rng(int(p.get("seed", 0)))
        n_frames = len(source)

        def gen_payloads():
            # try/finally (not a trailing close): if shard writing fails
            # or a cancel raises mid-generation, the abandoned generator
            # must still release the label volumes' file handles — a warm
            # worker would otherwise leak them across failed jobs
            try:
                with source:
                    for t in jobs_lib.track(
                        job, range(n_frames), total=n_frames, phase="records"
                    ):
                        img = np.asarray(read_img(t), dtype=np.float32)
                        if norm_rec:
                            # percentiles over the spatial axes only (2D
                            # multi-channel frames normalize per channel)
                            axes = tuple(range(dims))
                            lo = np.percentile(
                                img, p_lo, axis=axes, keepdims=True
                            )
                            hi = np.percentile(
                                img, p_hi, axis=axes, keepdims=True
                            )
                            img = np.clip(
                                (img - lo) / np.maximum(hi - lo, 1e-8),
                                0.0, 1.0,
                            ).astype(np.float32)
                        if dims == 3:
                            # explicit channel axis: a bare (Z, H, W)
                            # payload would decode as 2D multi-channel
                            img = img[..., None]
                        lab = read_lab(t)
                        flow, prob = flows_ops.flow_targets(lab)
                        has_fg = bool(prob.any())
                        for _ in range(n_crops):
                            # foreground-biased sampling: all-background
                            # crops teach only the prob head; retry a few
                            # positions so sparse scenes still feed the
                            # flow loss
                            for _try in range(8):
                                sl = tuple(
                                    slice(
                                        st := int(
                                            rng.integers(0, s - ps + 1)
                                        ),
                                        st + ps,
                                    )
                                    for s, ps in zip(img.shape[:dims], patch)
                                )
                                if not has_fg or prob[sl].any():
                                    break
                            yield fit_lib.encode_flow_example(
                                img[sl], flow[sl], prob[sl]
                            )
            finally:
                if labels_src is not None:
                    labels_src.close()

        os.makedirs(rec_dir, exist_ok=True)
        shard_paths = records_lib.write_shards(
            os.path.join(rec_dir, "train"), gen_payloads(),
            shard_size=int(p.get("shard_size", 128)),
        )
        n_channels = 1 if dims == 3 else source.n_channels
    else:
        first = next(records_lib.read_records(shard_paths[0]), None)
        if first is None:
            raise jobs_lib.JobError(
                f"job {job.id}: empty record shards in {rec_dir}"
            )
        n_channels = fit_lib._decode_flow(first)["image"].shape[-1]

    import jax.numpy as jnp

    base = zoo.get("flows_cells")
    cfg = dataclasses.replace(
        base,
        in_channels=n_channels,
        num_classes=dims + 1,  # (dy, dx[, dz]) x FLOW_SCALE + prob logit
        dims=dims,
        # volumetric nets default shallower (the unet3d convention):
        # depth-3 pooling fits the typical 8-32-plane z extent
        depth=int(p.get("depth", base.depth if dims == 2 else 3)),
        base_features=int(p.get("base_features", base.base_features)),
        norm=p.get("norm", base.norm),
        compute_dtype=jnp.dtype(p.get("compute_dtype", "bfloat16")),
    )
    steps = int(p.get("steps", 1000))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 3e-4)),
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
        gain_jitter=float(p.get("gain_jitter", 0.0)),
        offset_jitter=float(p.get("offset_jitter", 0.0)),
        noise_std=float(p.get("noise_std", 0.0)),
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
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
        keep_best_metric=(
            str(p.get("keep_best_metric", "eval_loss"))
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
    rep = jobs_lib.ProgressReporter(job, steps, phase="steps", raise_on_cancel=False)
    try:
        state = fit_lib.fit_flows(
            cfg, tc, fc, shard_paths, ckpt_dir=ckpt_dir, init_state=init_state,
            mesh=_train_mesh(p, fc.batch_size),
            should_stop=lambda: jobs_lib.cancel_requested(job),
            progress=lambda s, _t: rep.step(s),
        )
    except fit_lib.TrainingCancelled as e:
        raise jobs_lib.JobCancelled(str(e))
    except ValueError as e:
        raise jobs_lib.JobError(str(e))
    rep.finish()
    best_path = os.path.join(ckpt_dir, "best")
    used_best = fc.keep_best_metric and os.path.isdir(best_path)
    if used_best:
        state = train_lib.restore_checkpoint(best_path, state)
    reg_params = _ema_or_raw_params(ckpt_dir, fc, state, used_best)
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "flows", cfg,
        reg_params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path,
            "shards": os.path.join(rec_dir, "train-*.tfrecord")}


def _flows_serving(job: Job, config: ServerConfiguration, spatial, n_channels):
    """Shared setup for the flow-field serving jobs: load the ``flows``
    model, build the tile config, and return the fused device pass +
    host sink-grouping callable.

    The regular work (normalize -> tiled forward -> stitch -> Euler flow
    integration) is ONE jit graph (``infer.cached_flows_segmenter``,
    cached across jobs); the irregular sink grouping runs on host
    (``ops.flows.group_sinks``). Dimension-generic: a 3-axis ``spatial``
    with a ``dims == 3`` model serves whole volumes."""
    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.pipeline import infer as infer_lib

    dims = len(spatial)
    cfg, params, state = _require_model(job, config, "flows")
    if cfg.dims != dims:
        raise jobs_lib.JobError(
            f"job {job.id}: model is {cfg.dims}D, expected {dims}D"
        )
    if cfg.in_channels != n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {n_channels} input stack(s)"
        )
    p = job.params
    if int(p.get("tta", 1)) != 1:
        raise jobs_lib.JobError(
            "tta is unsupported for flow-field serving (vector outputs "
            "need component-aware flips); use tta: 1"
        )
    tc = _tile_config(
        job.params, dims=dims,
        frame_spatial=spatial, min_multiple=cfg.min_input_multiple,
        exact_only=True, allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg)
    n_iter = int(p.get("n_iter", 200))
    thresh = float(p.get("cellprob_threshold", 0.5))
    # "euler" (default, the sequential reference-faithful integration)
    # or "doubling" (pointer doubling on the integer successor map:
    # log2(n_iter) gathers, measured 2.4x the packed-quad Euler at 1024^2
    # with ap50-vs-euler 0.999 on the trained fixture — BASELINE.md r5)
    integrator = str(p.get("integrator", "euler"))
    try:
        seg = infer_lib.cached_flows_segmenter(
            cfg, tc, tuple(spatial), n_iter=n_iter,
            step_size=float(p.get("step_size", 1.0)),
            cellprob_threshold=thresh, integrator=integrator,
        )
    except ValueError as e:
        # bad patch/overlap/head combos are deterministic — never retry
        raise jobs_lib.JobError(str(e))
    min_sink = int(p.get("min_sink", 3))
    min_area = int(p.get("min_area", 15))
    snap = int(p.get("snap_radius", 3))

    def group(final_np: np.ndarray, prob_np: np.ndarray) -> np.ndarray:
        return flows_ops.group_sinks(
            final_np, prob_np > thresh,
            min_sink=min_sink, min_area=min_area, snap_radius=snap,
        )

    def stream(frames):
        def prefetch_host(out):
            infer_lib._copy_to_host_async(out[0])
            infer_lib._copy_to_host_async(out[1])

        return infer_lib.stream_frames(
            lambda f: seg(params, state, f), frames,
            prefetch_host=prefetch_host,
        )

    # raw pieces for callers that build their own dispatch (the
    # data_parallel branch wraps the UN-jitted segmenter in a mesh map)
    raw = (cfg, params, state, dict(
        n_iter=n_iter, step_size=float(p.get("step_size", 1.0)),
        cellprob_threshold=thresh, integrator=integrator,
    ))
    return stream, group, tc, raw


@register("segment_flows")
def segment_flows(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Flow-field INSTANCE segmentation of a (T, H, W) TIFF stack.

    The serving half of ``train_flows``: every foreground pixel follows
    the predicted flow to its cell's sink (fused into the network's jit
    graph), sinks group into instances on host — touching cells come out
    as SEPARATE labels, the failure mode argmax+CCL cannot avoid.
    input: one TIFF per channel. params: model, the usual tiling params
    (patch, overlap, normalize, p_lo/p_hi), frame range / roi,
    ``n_iter``/``step_size`` (flow integration), ``cellprob_threshold``,
    ``min_sink``/``min_area``/``snap_radius`` (sink grouping),
    ``save_prob`` (also write the cell-probability stack),
    ``localize`` (default true: per-instance centroid export),
    ``data_parallel`` (frames sharded over all chips — one whole frame
    per chip per dispatch, weights replicated, host grouping unchanged).
    Outputs: labels.tif (uint16 instance maps, ids unique per frame,
    renumbered 1..N), objects.h5 (btrack layout), optionally prob.tif.

    A ``dims == 3`` model routes to the VOLUMETRIC branch: ONE
    volume-sequence entry (per-timepoint z-stack files, or one file with
    the ``z`` pages-per-volume param), 3D instances per timepoint
    (touching NUCLEI separate in z too), per-timepoint
    ``labels_t{t:04d}.tif`` + one objects.h5 whose z column carries the
    per-object z centroid (volumetric tracking-ready).
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    cfg_probe, _, _ = _require_model(job, config, "flows")
    if cfg_probe.dims == 3:
        return _segment_flows_volumes(job, config, paths)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))
    stream, group, tc, raw = _flows_serving(
        job, config, source.spatial, source.n_channels
    )

    timer = PhaseTimer()
    n_frames = len(source)
    do_localize = job.params.get("localize", True)
    save_prob = bool(job.params.get("save_prob"))
    min_area = int(job.params.get("min_area", 15))
    labels_path = os.path.join(job.output, "labels.tif")
    px = float(n_frames) * np.prod(source.spatial)
    comp = _out_compression(job)
    labels_w = _append_writer(labels_path, px * 2, comp)
    prob_w = (
        _append_writer(os.path.join(job.output, "prob.tif"), px * 4, comp)
        if save_prob else None
    )
    tables = []
    n_objects = 0
    t0 = time.time()

    def handle(t: int, final_np: np.ndarray, prob_np: np.ndarray) -> None:
        nonlocal n_objects
        with timer.phase("group"):
            lab = group(final_np, prob_np)
        n_objects += int(lab.max())
        with timer.phase("write"):
            labels_w.append(lab.astype(np.uint16, copy=False))
            if prob_w is not None:
                prob_w.append(prob_np.astype(np.float32, copy=False))
        if do_localize:
            inten = source.frame(t)
            if inten.ndim == 3:
                inten = inten.mean(axis=-1)
            with timer.phase("localize"):
                tables.append(
                    loc_lib.localize_instances_table(
                        lab, t=t + source.frame_offset,
                        intensity=inten, min_area=min_area,
                    )
                )

    import jax

    try:
        with source:
            if job.params.get("data_parallel") and jax.device_count() > 1:
                # frames sharded over the mesh: one whole frame per chip
                # per dispatch through the fused graph (weights
                # replicated, zero inter-chip traffic); sink grouping
                # stays per-frame on host
                import jax.numpy as jnp

                from sequitr_tpu import parallel
                from sequitr_tpu.pipeline import infer as infer_lib

                cfg_m, params_m, state_m, skw = raw
                mesh = parallel.make_mesh()
                n_dev = mesh.devices.size
                dp = parallel.make_dp_frame_mapper(
                    infer_lib.make_flows_segmenter(
                        cfg_m, tc, tuple(source.spatial), **skw
                    ),
                    mesh,
                )
                t = 0
                for chunk, n_real in _dp_chunk_stream(
                    job, source.chunks(n_dev), n_frames, n_dev
                ):
                    out_f, out_p = dp(
                        params_m, state_m, jnp.asarray(chunk, jnp.float32)
                    )
                    with timer.phase("fetch"):
                        got_f = np.asarray(out_f)
                        got_p = np.asarray(out_p)
                    for k in range(n_real):
                        handle(t, got_f[k], got_p[k])
                        t += 1
            else:
                rep = jobs_lib.ProgressReporter(job, n_frames)
                results = stream(_reads_fail_fast(job, source.frames()))
                for t in range(n_frames):
                    with timer.phase("infer"):
                        final, prob = next(results)
                    with timer.phase("fetch"):
                        final_np = np.asarray(final)
                        prob_np = np.asarray(prob)
                    handle(t, final_np, prob_np)
                    rep.step()
                rep.finish()
    except BaseException:
        labels_w.abort()
        if prob_w is not None:
            prob_w.abort()
        raise
    labels_w.close()
    if prob_w is not None:
        prob_w.close()

    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), n_frames=n_frames, n_objects=n_objects,
        total_s=round(total_s, 4),
    )
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    outputs: Dict[str, str] = {
        "labels": labels_path, "metrics": json.dumps(metrics),
    }
    if prob_w is not None:
        outputs["prob"] = os.path.join(job.output, "prob.tif")
    if do_localize:
        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=source.frame_offset + n_frames
        )
        outputs["objects"] = h5_path
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, tables)
            outputs["objects_csv"] = csv_path
    return outputs


def _segment_flows_volumes(
    job: Job, config: ServerConfiguration, paths
) -> Dict[str, str]:
    """Volumetric branch of ``segment_flows`` (``dims == 3`` models).

    One whole (Z, H, W) volume per dispatch through the fused 3D graph
    (trilinear flow integration on device), 3D sink grouping on host,
    per-timepoint label volumes + ONE btrack objects.h5 with per-object
    z centroids — the 3D+time instance workflow."""
    import jax.numpy as jnp

    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.utils import PhaseTimer

    if job.params.get("roi") is not None:
        raise jobs_lib.JobError(
            "roi serving is 2D-only (crop the volume upstream)"
        )
    if len(paths) != 1:
        raise jobs_lib.JobError(
            f"3D segment_flows takes ONE volume-sequence entry (the model "
            f"is single-channel), got {len(paths)}"
        )
    try:
        source = VolumeSequence(paths[0], z=_parse_z_pages(job))
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        source = _apply_frame_range(job, source)
        stream, group, tc, _raw = _flows_serving(job, config, source.spatial, 1)
    except BaseException:
        source.close()
        raise

    timer = PhaseTimer()
    n_vols = len(source)
    do_localize = job.params.get("localize", True)
    save_prob = bool(job.params.get("save_prob"))
    min_area = int(job.params.get("min_area", 15))
    comp = _out_compression(job)
    tables = []
    n_objects = 0
    label_files = []
    rep = jobs_lib.ProgressReporter(job, n_vols, phase="volumes")
    t0 = time.time()
    # no writer-abort wrapper here (unlike the 2D branch's page-append
    # stack): each timepoint's file is written atomically on its own, so
    # a mid-stack failure leaves only complete per-timepoint volumes and
    # the job state records the failure
    with source:
        results = stream(
            (np.asarray(v, np.float32)
             for v in _reads_fail_fast(job, source.volumes()))
        )
        for t in range(n_vols):
            with timer.phase("infer"):
                final, prob = next(results)
            with timer.phase("fetch"):
                final_np = np.asarray(final)
                prob_np = np.asarray(prob)
            with timer.phase("group"):
                lab = group(final_np, prob_np)
            n_objects += int(lab.max())
            t_abs = t + source.frame_offset
            with timer.phase("write"):
                lp = os.path.join(job.output, f"labels_t{t_abs:04d}.tif")
                tiff.write_stack(
                    lp, lab.astype(np.uint16, copy=False),
                    compression=comp,
                )
                label_files.append(lp)
                if save_prob:
                    tiff.write_stack(
                        os.path.join(
                            job.output, f"prob_t{t_abs:04d}.tif"
                        ),
                        prob_np.astype(np.float32, copy=False),
                        compression=comp,
                    )
            if do_localize:
                with timer.phase("localize"):
                    tables.append(
                        loc_lib.localize_instances_table(
                            lab, t=t_abs,
                            intensity=np.asarray(
                                source.volume(t), np.float32
                            ),
                            min_area=min_area,
                        )
                    )
            rep.step()
        rep.finish()

    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), n_volumes=n_vols, n_objects=n_objects,
        total_s=round(total_s, 4),
    )
    if total_s > 0:
        metrics["volumes_per_sec"] = round(n_vols / total_s, 3)
    outputs: Dict[str, str] = {
        "labels": os.path.join(job.output, "labels_t*.tif"),
        "metrics": json.dumps(metrics),
    }
    if save_prob:
        outputs["prob"] = os.path.join(job.output, "prob_t*.tif")
    if do_localize:
        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=source.frame_offset + n_vols
        )
        outputs["objects"] = h5_path
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, tables)
            outputs["objects_csv"] = csv_path
    return outputs


def _score_instances(
    job: Job, source, read_truth, pred_labels
) -> Dict[str, str]:
    """Pooled instance-AP scoring loop shared by the learned-instance
    evaluate pipelines (``evaluate_flows`` 2D, ``evaluate_stars``).

    ``pred_labels``: iterator of predicted per-frame instance label maps
    (host int arrays), one per source frame; ``read_truth(t)``: the
    ground-truth instance map for ABSOLUTE frame index ``t``. Pooled
    counts — AP over the whole stack, not a mean of per-frame APs (a
    frame with one cell would weigh as much as one with hundreds).
    Honors ``thresholds``, ``per_frame`` and ``save_labels`` params;
    owns the progress reporter and the labels writer lifecycle.
    """
    from sequitr_tpu.ops import flows as flows_ops

    thresholds = tuple(
        float(v) for v in job.params.get("thresholds", (0.5, 0.75, 0.9))
    )
    n_frames = len(source)
    labels_w = (
        _append_writer(
            os.path.join(job.output, "labels.tif"),
            float(n_frames) * np.prod(source.spatial) * 2,
            _out_compression(job),
        )
        if job.params.get("save_labels") else None
    )
    tp = {t: 0 for t in thresholds}
    tot_gt = 0
    tot_pred = 0
    iou_sum = 0.0
    iou_n = 0
    per_frame = [] if job.params.get("per_frame") else None
    rep = jobs_lib.ProgressReporter(job, n_frames)
    try:
        with source:
            for t in range(n_frames):
                lab = next(pred_labels)
                truth_t = read_truth(t + source.frame_offset)
                # renumber truth ids densely (match_instances indexes by
                # max id; sparse ids from cropped stacks stay cheap)
                ids = np.unique(truth_t[truth_t > 0])
                if ids.size:
                    remap = np.zeros(int(ids.max()) + 1, dtype=np.int64)
                    remap[ids] = np.arange(1, ids.size + 1)
                    truth_t = remap[np.maximum(truth_t, 0)]
                ious, n_gt, n_pred = flows_ops.match_instances(truth_t, lab)
                tot_gt += n_gt
                tot_pred += n_pred
                for th in thresholds:
                    tp[th] += int((ious >= th).sum())
                good = ious[ious >= 0.5]
                iou_sum += float(good.sum())
                iou_n += int(good.size)
                if per_frame is not None:
                    m_tp = int((ious >= 0.5).sum())
                    denom = n_gt + n_pred - m_tp
                    per_frame.append(
                        round(m_tp / denom, 6) if denom else None
                    )
                if labels_w is not None:
                    labels_w.append(lab.astype(np.uint16, copy=False))
                rep.step()
            rep.finish()
    except BaseException:
        if labels_w is not None:
            labels_w.abort()
        raise

    metrics = {
        "n_frames": n_frames, "n_gt": tot_gt, "n_pred": tot_pred,
        "mean_matched_iou": round(iou_sum / iou_n, 6) if iou_n else 0.0,
    }
    for th in thresholds:
        denom = tot_gt + tot_pred - tp[th]
        metrics[f"ap{int(round(th * 100))}"] = (
            round(tp[th] / denom, 6) if denom else 1.0
        )
    if per_frame is not None:
        metrics["per_frame_ap50"] = per_frame
    outputs: Dict[str, str] = {"metrics": json.dumps(metrics)}
    if labels_w is not None:
        labels_w.close()
        outputs["labels"] = os.path.join(job.output, "labels.tif")
    return outputs


@register("evaluate_flows")
def evaluate_flows(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Score a ``flows`` model against ground-truth INSTANCE labels.

    input: [image.tif, ..., instances.tif] — LAST path is the ground
    truth (the ``train_flows`` convention). Serves the model exactly as
    ``segment_flows`` would, then matches predicted to true instances
    per frame (Hungarian, IoU-optimal — ``ops.flows.match_instances``)
    and reports the standard cell-segmentation AP:
    AP@t = TP / (TP + FP + FN), pooled over frames, at
    ``thresholds`` (default [0.5, 0.75, 0.9]), plus
    ``mean_matched_iou`` over IoU>=0.5 matches and instance counts.
    params: the ``segment_flows`` serving params, ``per_frame: true``
    for a per-frame ap50 series, ``save_labels: true`` to also write
    the predicted instance maps.

    A ``dims == 3`` model routes to the VOLUMETRIC branch: input =
    [image volume-sequence entry, instance-label volume-sequence entry]
    (the ``z`` pages-per-volume param applies to both), AP pooled over
    3D instances across timepoints.
    """
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            f"job {job.id}: need [image(s)..., instance labels], "
            f"got {len(paths)} input(s)"
        )
    cfg_probe, _, _ = _require_model(job, config, "flows")
    if cfg_probe.dims == 3:
        return _evaluate_flows_volumes(job, config, paths)
    try:
        source = FrameSource(paths=paths[:-1])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_frame_range(job, source)
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
    shape = (source.frame_offset + len(source),) + source.spatial
    if tuple(t_shape)[1:] != source.spatial or t_shape[0] < shape[0]:
        raise jobs_lib.JobError(
            f"image/label shape mismatch: need >= {shape}, got {tuple(t_shape)}"
        )
    stream, group, tc, _raw = _flows_serving(
        job, config, source.spatial, source.n_channels
    )

    def pred_labels():
        results = stream(_reads_fail_fast(job, source.frames()))
        while True:
            final, prob = next(results)
            yield group(np.asarray(final), np.asarray(prob))

    try:
        return _score_instances(job, source, read_truth, pred_labels())
    finally:
        if t_reader is not None:
            t_reader.close()


def _evaluate_flows_volumes(
    job: Job, config: ServerConfiguration, paths
) -> Dict[str, str]:
    """Volumetric branch of ``evaluate_flows``: [image volume entry,
    instance-label volume entry], Hungarian AP over 3D instances pooled
    across timepoints (same metric contract as the 2D branch)."""
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.ops import flows as flows_ops

    if len(paths) != 2:
        raise jobs_lib.JobError(
            f"3D evaluate_flows takes [image volumes, label volumes] "
            f"(2 entries), got {len(paths)}"
        )
    z = _parse_z_pages(job)
    try:
        source = VolumeSequence(paths[0], z=z)
        truth = VolumeSequence(paths[1], z=z)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        if truth.spatial != source.spatial or len(truth) < len(source):
            raise jobs_lib.JobError(
                f"image/label volume mismatch: images "
                f"{(len(source),) + source.spatial}, labels "
                f"{(len(truth),) + truth.spatial}"
            )
        source = _apply_frame_range(job, source)
        stream, group, tc, _raw = _flows_serving(job, config, source.spatial, 1)
    except BaseException:
        source.close()
        truth.close()
        raise
    thresholds = tuple(
        float(v) for v in job.params.get("thresholds", (0.5, 0.75, 0.9))
    )
    n_vols = len(source)
    tp = {t: 0 for t in thresholds}
    tot_gt = 0
    tot_pred = 0
    iou_sum = 0.0
    iou_n = 0
    per_frame = [] if job.params.get("per_frame") else None
    rep = jobs_lib.ProgressReporter(job, n_vols, phase="volumes")
    with source, truth:
        results = stream(
            (np.asarray(v, np.float32)
             for v in _reads_fail_fast(job, source.volumes()))
        )
        for t in range(n_vols):
            final, prob = next(results)
            lab = group(np.asarray(final), np.asarray(prob))
            truth_t = np.asarray(
                truth.volume(t + source.frame_offset), np.int64
            )
            ids = np.unique(truth_t[truth_t > 0])
            if ids.size:
                remap = np.zeros(int(ids.max()) + 1, dtype=np.int64)
                remap[ids] = np.arange(1, ids.size + 1)
                truth_t = remap[np.maximum(truth_t, 0)]
            ious, n_gt, n_pred = flows_ops.match_instances(truth_t, lab)
            tot_gt += n_gt
            tot_pred += n_pred
            for th in thresholds:
                tp[th] += int((ious >= th).sum())
            good = ious[ious >= 0.5]
            iou_sum += float(good.sum())
            iou_n += int(good.size)
            if per_frame is not None:
                m_tp = int((ious >= 0.5).sum())
                denom = n_gt + n_pred - m_tp
                per_frame.append(
                    round(m_tp / denom, 6) if denom else None
                )
            rep.step()
        rep.finish()

    metrics = {
        "n_volumes": n_vols, "n_gt": tot_gt, "n_pred": tot_pred,
        "mean_matched_iou": round(iou_sum / iou_n, 6) if iou_n else 0.0,
    }
    for th in thresholds:
        denom = tot_gt + tot_pred - tp[th]
        metrics[f"ap{int(round(th * 100))}"] = (
            round(tp[th] / denom, 6) if denom else 1.0
        )
    if per_frame is not None:
        metrics["per_volume_ap50"] = per_frame
    return {"metrics": json.dumps(metrics)}


def _stars_serving(job: Job, config: ServerConfiguration, spatial, n_channels):
    """Shared setup for the star-convex serving jobs: load the ``stars``
    model, build the tile config, and return the fused device pass +
    host NMS/rasterization callable.

    The regular work (normalize -> tiled forward -> stitch -> sigmoid/
    clamp) is ONE jit graph (``infer.cached_stars_predictor``, cached
    across jobs); the irregular candidate NMS + polygon rasterization
    runs on host (``ops.stardist.instances_from_rays``) — the same
    regular/irregular split as the flows family's sink grouping."""
    from sequitr_tpu.ops import stardist as sd
    from sequitr_tpu.pipeline import infer as infer_lib

    if len(spatial) != 2:
        raise jobs_lib.JobError(
            f"star-convex serving takes 2D frames, got {spatial}; "
            f"volumetric instances are served by segment_flows"
        )
    cfg, params, state = _require_model(job, config, "stars")
    if cfg.in_channels != n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {n_channels} input stack(s)"
        )
    p = job.params
    if int(p.get("tta", 1)) != 1:
        raise jobs_lib.JobError(
            "tta is unsupported for star-convex serving (per-ray outputs "
            "need permutation-aware flips); use tta: 1"
        )
    tc = _tile_config(
        job.params, dims=2,
        frame_spatial=spatial, min_multiple=cfg.min_input_multiple,
        exact_only=True, allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg)
    try:
        pred = infer_lib.cached_stars_predictor(cfg, tc, tuple(spatial))
    except ValueError as e:
        # bad patch/overlap/head combos are deterministic — never retry
        raise jobs_lib.JobError(str(e))
    prob_thresh = float(p.get("prob_threshold", 0.5))
    nms_thresh = float(p.get("nms_threshold", 0.3))
    min_area = int(p.get("min_area", 15))
    peak_window = int(p.get("peak_window", 5))

    def to_labels(prob_np: np.ndarray, dist_np: np.ndarray) -> np.ndarray:
        return sd.instances_from_rays(
            prob_np, dist_np, prob_thresh=prob_thresh,
            nms_thresh=nms_thresh, min_area=min_area,
            peak_window=peak_window,
        )

    def stream(frames):
        def prefetch_host(out):
            infer_lib._copy_to_host_async(out[0])
            infer_lib._copy_to_host_async(out[1])

        return infer_lib.stream_frames(
            lambda f: pred(params, state, f), frames,
            prefetch_host=prefetch_host,
        )

    # raw pieces for callers that build their own dispatch (the
    # data_parallel branch wraps the UN-jitted predictor in a mesh map)
    raw = (cfg, params, state)
    return stream, to_labels, tc, raw


@register("train_stars")
def train_stars(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Train a star-convex instance segmenter (StarDist-style,
    ops.stardist).

    The SECOND learned touching-cell separator, complementing
    ``train_flows``: every pixel predicts its distances to the instance
    boundary along ``n_rays`` fixed directions plus an object
    probability, and serving keeps one polygon per cell via greedy NMS.
    The polygon prior is the stronger separator for convex nucleus-like
    shapes; flows cover concave shapes and 3D.

    input: [image.tif, ..., instances.tif] — channel stack(s), LAST
    path the ground-truth INSTANCE label stack (each distinct positive
    value one cell). The job computes ray-distance + normalized-EDT
    targets per FULL frame (``ops.stardist.star_targets`` — cropping
    after marching keeps boundary-crossing cells' distances exact),
    builds its own record shards once (random ``patch`` crops,
    foreground-biased, REUSED on resume), then trains a regression
    U-Net with a ``1 + n_rays``-channel head via ``fit_stars``.

    params: ``model`` (output name, required), ``n_rays`` (default 32,
    multiple of 4), ``patch`` (default [64, 64]), ``patches_per_frame``
    (default 4), ``max_dist`` (optional px cap on the target ray march —
    default the largest instance bbox diagonal; cap it when one huge
    object would make record building O(H*W*n_rays*diag) per frame),
    ``normalize`` (default true — record/serve
    normalization must share one intensity space), the standard
    training/observability params of ``train_unet2d`` and architecture
    params (depth, base_features — default the ``stars_cells`` preset).
    2D only: volumetric instances train via ``train_flows dims: 3``.
    Registers the model as kind ``stars`` (served by ``segment_stars``).
    """
    import glob as glob_lib

    import jax

    from sequitr_tpu.data import records as records_lib
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.models import zoo
    from sequitr_tpu.ops import stardist as sd
    from sequitr_tpu.pipeline import fit as fit_lib
    from sequitr_tpu.pipeline import train as train_lib

    p = job.params
    if int(p.get("dims", 2)) != 2:
        raise jobs_lib.JobError(
            "train_stars is 2D only (star-convex rays); volumetric "
            "instances train via train_flows dims: 3"
        )
    n_rays = int(p.get("n_rays", 32))
    if n_rays < 4 or n_rays % 4:
        raise jobs_lib.JobError(
            f"n_rays must be a positive multiple of 4, got {n_rays}"
        )

    rec_dir = os.path.join(job.output, "records")
    shard_paths = sorted(glob_lib.glob(os.path.join(rec_dir, "*.tfrecord")))
    if not shard_paths:
        paths = _resolve_inputs(job)
        if len(paths) < 2:
            raise jobs_lib.JobError(
                f"job {job.id}: need [image(s)..., instance labels], "
                f"got {len(paths)} input(s)"
            )
        try:
            source = FrameSource(paths=paths[:-1])
        except ValueError as e:
            raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
        try:
            lab_stack = np.asarray(tiff.read_stack(paths[-1]))
        except (ValueError, OSError) as e:
            raise jobs_lib.JobError(f"job {job.id}: cannot read labels: {e}")
        if lab_stack.ndim == 2:
            lab_stack = lab_stack[None]
        if (
            lab_stack.shape[0] < len(source)
            or tuple(lab_stack.shape[1:]) != source.spatial
        ):
            raise jobs_lib.JobError(
                f"image/label shape mismatch: images "
                f"{(len(source),) + source.spatial},"
                f" labels {tuple(lab_stack.shape)}"
            )
        patch = tuple(int(v) for v in p.get("patch", (64, 64)))
        if len(patch) != 2 or any(
            ps > s for s, ps in zip(source.spatial, patch)
        ):
            source.close()
            raise jobs_lib.JobError(
                f"patch {patch} must be 2 axes and fit the frames "
                f"{source.spatial}"
            )
        n_crops = int(p.get("patches_per_frame", 4))
        p_lo, p_hi = float(p.get("p_lo", 5.0)), float(p.get("p_hi", 99.5))
        norm_rec = p.get("normalize", True)
        norm_rec = bool(norm_rec) and norm_rec != "none"
        rng = np.random.default_rng(int(p.get("seed", 0)))
        n_frames = len(source)
        # ray-march budget: star_targets defaults to the largest instance
        # bbox diagonal, which is O(H*W*n_rays*max_dist) host work — one
        # 300 px cell in a 1024^2 frame costs minutes/frame. Cap it here
        # (rays longer than max_dist truncate, exactly like cells cut by
        # the frame border) and say what budget each frame got.
        max_dist = p.get("max_dist")
        max_dist = None if max_dist is None else float(max_dist)
        log.info(
            "train_stars %s: ray march budget = %s (n_rays=%d, %d frames)",
            job.id,
            "auto (largest instance bbox diagonal)"
            if max_dist is None else f"{max_dist:g} px",
            n_rays, n_frames,
        )

        def gen_payloads():
            with source:
                for t in jobs_lib.track(
                    job, range(n_frames), total=n_frames, phase="records"
                ):
                    img = np.asarray(source.frame(t), dtype=np.float32)
                    if norm_rec:
                        lo = np.percentile(
                            img, p_lo, axis=(0, 1), keepdims=True
                        )
                        hi = np.percentile(
                            img, p_hi, axis=(0, 1), keepdims=True
                        )
                        img = np.clip(
                            (img - lo) / np.maximum(hi - lo, 1e-8), 0.0, 1.0
                        ).astype(np.float32)
                    dist, prob = sd.star_targets(
                        lab_stack[t].astype(np.int64), n_rays=n_rays,
                        max_dist=max_dist,
                    )
                    has_fg = bool(prob.any())
                    for _ in range(n_crops):
                        # foreground-biased sampling: all-background crops
                        # teach only the prob head; retry a few positions
                        # so sparse scenes still feed the distance loss
                        for _try in range(8):
                            sl = tuple(
                                slice(
                                    st := int(rng.integers(0, s - ps + 1)),
                                    st + ps,
                                )
                                for s, ps in zip(img.shape[:2], patch)
                            )
                            if not has_fg or prob[sl].any():
                                break
                        yield fit_lib.encode_stars_example(
                            img[sl], dist[sl], prob[sl]
                        )

        os.makedirs(rec_dir, exist_ok=True)
        shard_paths = records_lib.write_shards(
            os.path.join(rec_dir, "train"), gen_payloads(),
            shard_size=int(p.get("shard_size", 128)),
        )
        n_channels = source.n_channels
    else:
        first = next(records_lib.read_records(shard_paths[0]), None)
        if first is None:
            raise jobs_lib.JobError(
                f"job {job.id}: empty record shards in {rec_dir}"
            )
        decoded = fit_lib._decode_stars(first)
        n_channels = decoded["image"].shape[-1]
        n_rays = decoded["dist"].shape[-1]

    import jax.numpy as jnp

    base = zoo.get("stars_cells")
    cfg = dataclasses.replace(
        base,
        in_channels=n_channels,
        num_classes=1 + n_rays,  # prob logit + per-ray distances
        depth=int(p.get("depth", base.depth)),
        base_features=int(p.get("base_features", base.base_features)),
        norm=p.get("norm", base.norm),
        compute_dtype=jnp.dtype(p.get("compute_dtype", "bfloat16")),
    )
    steps = int(p.get("steps", 1000))
    tc = train_lib.TrainConfig(
        learning_rate=float(p.get("learning_rate", 3e-4)),
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
        gain_jitter=float(p.get("gain_jitter", 0.0)),
        offset_jitter=float(p.get("offset_jitter", 0.0)),
        noise_std=float(p.get("noise_std", 0.0)),
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
        seed=int(p.get("seed", 0)),
        keep_checkpoints=int(p.get("keep_checkpoints", 3)),
        keep_best_metric=(
            str(p.get("keep_best_metric", "eval_loss"))
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
    rep = jobs_lib.ProgressReporter(job, steps, phase="steps", raise_on_cancel=False)
    try:
        state = fit_lib.fit_stars(
            cfg, tc, fc, shard_paths, ckpt_dir=ckpt_dir, init_state=init_state,
            mesh=_train_mesh(p, fc.batch_size),
            should_stop=lambda: jobs_lib.cancel_requested(job),
            progress=lambda s, _t: rep.step(s),
        )
    except fit_lib.TrainingCancelled as e:
        raise jobs_lib.JobCancelled(str(e))
    except ValueError as e:
        raise jobs_lib.JobError(str(e))
    rep.finish()
    best_path = os.path.join(ckpt_dir, "best")
    used_best = fc.keep_best_metric and os.path.isdir(best_path)
    if used_best:
        state = train_lib.restore_checkpoint(best_path, state)
    reg_params = _ema_or_raw_params(ckpt_dir, fc, state, used_best)
    model_dir = save_model(
        config.models_dir, _require_param(job, "model"), "stars", cfg,
        reg_params, state.model_state
    )
    return {"model": model_dir, "metrics_file": fc.metrics_path,
            "shards": os.path.join(rec_dir, "train-*.tfrecord")}


@register("segment_stars")
def segment_stars(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Star-convex INSTANCE segmentation of a (T, H, W) TIFF stack.

    The serving half of ``train_stars``: the fused device graph emits
    per-pixel object probability + per-ray boundary distances; greedy
    polygon NMS on host keeps one star-convex polygon per cell —
    touching convex cells come out as SEPARATE labels. input: one TIFF
    per channel. params: model, the usual tiling params (patch, overlap,
    normalize, p_lo/p_hi), frame range / roi, ``prob_threshold``
    (candidate gate, default 0.5), ``nms_threshold`` (max claimed
    fraction of a polygon's area, default 0.3), ``peak_window``
    (candidate local-max window, default 5), ``min_area``, ``save_prob``
    (also write the object-probability stack), ``localize`` (default
    true: per-instance centroid export), ``data_parallel`` (frames
    sharded over all chips — one whole frame per chip per dispatch,
    weights replicated, host NMS unchanged). Outputs: labels.tif
    (uint16 instance maps, ids unique per frame, renumbered 1..N),
    objects.h5 (btrack layout), optionally prob.tif.
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))
    stream, to_labels, tc, raw = _stars_serving(
        job, config, source.spatial, source.n_channels
    )

    timer = PhaseTimer()
    n_frames = len(source)
    do_localize = job.params.get("localize", True)
    save_prob = bool(job.params.get("save_prob"))
    min_area = int(job.params.get("min_area", 15))
    labels_path = os.path.join(job.output, "labels.tif")
    px = float(n_frames) * np.prod(source.spatial)
    comp = _out_compression(job)
    labels_w = _append_writer(labels_path, px * 2, comp)
    prob_w = (
        _append_writer(os.path.join(job.output, "prob.tif"), px * 4, comp)
        if save_prob else None
    )
    tables = []
    n_objects = 0
    t0 = time.time()

    def handle(t: int, prob_np: np.ndarray, dist_np: np.ndarray) -> None:
        nonlocal n_objects
        with timer.phase("nms"):
            lab = to_labels(prob_np, dist_np)
        n_objects += int(lab.max())
        with timer.phase("write"):
            labels_w.append(lab.astype(np.uint16, copy=False))
            if prob_w is not None:
                prob_w.append(prob_np.astype(np.float32, copy=False))
        if do_localize:
            inten = source.frame(t)
            if inten.ndim == 3:
                inten = inten.mean(axis=-1)
            with timer.phase("localize"):
                tables.append(
                    loc_lib.localize_instances_table(
                        lab, t=t + source.frame_offset,
                        intensity=inten, min_area=min_area,
                    )
                )

    import jax

    try:
        with source:
            if job.params.get("data_parallel") and jax.device_count() > 1:
                # frames sharded over the mesh: one whole frame per chip
                # per dispatch through the fused graph (weights
                # replicated, zero inter-chip traffic); NMS stays
                # per-frame on host
                import jax.numpy as jnp

                from sequitr_tpu import parallel
                from sequitr_tpu.pipeline import infer as infer_lib

                cfg_m, params_m, state_m = raw
                mesh = parallel.make_mesh()
                n_dev = mesh.devices.size
                dp = parallel.make_dp_frame_mapper(
                    infer_lib.make_stars_predictor(
                        cfg_m, tc, tuple(source.spatial)
                    ),
                    mesh,
                )
                t = 0
                for chunk, n_real in _dp_chunk_stream(
                    job, source.chunks(n_dev), n_frames, n_dev
                ):
                    out_p, out_d = dp(
                        params_m, state_m, jnp.asarray(chunk, jnp.float32)
                    )
                    with timer.phase("fetch"):
                        got_p = np.asarray(out_p)
                        got_d = np.asarray(out_d)
                    for k in range(n_real):
                        handle(t, got_p[k], got_d[k])
                        t += 1
            else:
                rep = jobs_lib.ProgressReporter(job, n_frames)
                results = stream(_reads_fail_fast(job, source.frames()))
                for t in range(n_frames):
                    with timer.phase("infer"):
                        prob, dist = next(results)
                    with timer.phase("fetch"):
                        prob_np = np.asarray(prob)
                        dist_np = np.asarray(dist)
                    handle(t, prob_np, dist_np)
                    rep.step()
                rep.finish()
    except BaseException:
        labels_w.abort()
        if prob_w is not None:
            prob_w.abort()
        raise
    labels_w.close()
    if prob_w is not None:
        prob_w.close()

    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), n_frames=n_frames, n_objects=n_objects,
        total_s=round(total_s, 4),
    )
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    outputs: Dict[str, str] = {
        "labels": labels_path, "metrics": json.dumps(metrics),
    }
    if prob_w is not None:
        outputs["prob"] = os.path.join(job.output, "prob.tif")
    if do_localize:
        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=source.frame_offset + n_frames
        )
        outputs["objects"] = h5_path
        if job.params.get("save_objects_csv"):
            csv_path = os.path.join(job.output, "objects.csv")
            loc_lib.export_objects_csv(csv_path, tables)
            outputs["objects_csv"] = csv_path
    return outputs


@register("evaluate_stars")
def evaluate_stars(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Score a ``stars`` model against ground-truth INSTANCE labels.

    input: [image.tif, ..., instances.tif] — LAST path is the ground
    truth (the ``train_stars`` convention). Serves the model exactly as
    ``segment_stars`` would, then scores pooled instance AP (the shared
    ``_score_instances`` loop: Hungarian IoU-optimal matching,
    AP@t = TP / (TP + FP + FN) at ``thresholds``, plus
    ``mean_matched_iou`` and counts). params: the ``segment_stars``
    serving params, ``per_frame: true`` for a per-frame ap50 series,
    ``save_labels: true`` to also write the predicted instance maps.
    """
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            f"job {job.id}: need [image(s)..., instance labels], "
            f"got {len(paths)} input(s)"
        )
    try:
        source = FrameSource(paths=paths[:-1])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_frame_range(job, source)
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
    shape = (source.frame_offset + len(source),) + source.spatial
    if tuple(t_shape)[1:] != source.spatial or t_shape[0] < shape[0]:
        raise jobs_lib.JobError(
            f"image/label shape mismatch: need >= {shape}, got {tuple(t_shape)}"
        )
    stream, to_labels, tc, _raw = _stars_serving(
        job, config, source.spatial, source.n_channels
    )

    def pred_labels():
        results = stream(_reads_fail_fast(job, source.frames()))
        while True:
            prob, dist = next(results)
            yield to_labels(np.asarray(prob), np.asarray(dist))

    try:
        return _score_instances(job, source, read_truth, pred_labels())
    finally:
        if t_reader is not None:
            t_reader.close()
