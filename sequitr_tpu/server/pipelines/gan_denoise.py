"""Enhancement/denoising pipelines: pix2pix GAN serving + Noise2Void.

Split out of ``server.py`` (round-5 verdict item 4): ``enhancement_gan``,
``denoise`` (N2V serving, 2D + volumetric), ``evaluate_denoise`` and
``evaluate_gan``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.jobs import Job
from sequitr_tpu.server.server import (
    _require_polyphase_model,
    _append_writer,
    _apply_frame_range,
    _apply_roi,
    _auto_frame_batch,
    _dp_chunk_stream,
    _out_compression,
    _parse_z_pages,
    _reads_fail_fast,
    _require_model,
    _resolve_inputs,
    _spatial_ways,
    _tile_config,
    register,
)

import logging
log = logging.getLogger("sequitr_tpu.server")

def _gan_setup(job: Job, config: ServerConfiguration, source):
    """Load + BN-fold the job's GAN model and build its tile config.

    Folding the inference-mode batch norm into the generator conv weights
    is the same treatment the segmentation path gets
    (``models.gan.fold_generator``); the folded config is what keys the
    cross-job ``cached_gan_enhancer``. The channel-count check turns a
    mismatched multi-channel submission into a deterministic JobError
    instead of a conv shape error deep inside the generator.
    """
    from sequitr_tpu.models import gan as gan_lib

    cfg, params, state = _require_model(job, config, "gan")
    if cfg.in_channels != source.n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {source.n_channels} input stack(s)"
        )
    cfg, params, state = gan_lib.fold_generator(cfg, params, state)
    # ``out_dtype: float16`` halves the enhanced-frame D2H + disk (maps to
    # the TileConfig output-dtype knob; the cast happens on device)
    # .copy() (not dict(...)) so a ParamTracker conservatively marks all
    # params read — dict(subclass) bypasses the overridden methods and
    # would leave this pipeline's reads invisible to the unknown-param
    # warning
    p = job.params.copy()
    if "out_dtype" in p:
        p["probs_dtype"] = p["out_dtype"]
    tc = _tile_config(
        p, dims=2,
        frame_spatial=source.spatial, min_multiple=cfg.min_input_multiple,
        exact_only=True, allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg.generator_config)
        if job.params.get("spatial_parallel"):
            raise jobs_lib.JobError(
                "polyphase + spatial_parallel is not supported; the "
                "spatial path runs its own halo-exchange forward"
            )
    return cfg, params, state, tc


@register("enhancement_gan")
def enhancement_gan(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """GAN generator enhancement pass over a TIFF stack (SURVEY.md §3.4).

    input: one TIFF per input channel (multi-fluorophore models follow the
    segmentation convention: channels stacked on the trailing axis, one
    stack per path). params: model, patch, overlap, window, normalize,
    frame_batch, data_parallel (frames sharded over all chips). Outputs:
    enhanced.tif (float32; multi-channel output is frame-major paged, see
    ``enhanced_layout``).
    """
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.pipeline import infer as infer_lib

    paths = _resolve_inputs(job)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))

    cfg, params, state, tc = _gan_setup(job, config, source)

    from sequitr_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    # same streaming treatment as segmentation: dispatch runs prefetch
    # frames ahead so frame i+1's H2D copy overlaps frame i's compute, and
    # enhanced frames append to disk as they arrive (no output stack in
    # RAM). Small frames additionally batch per dispatch (_auto_frame_batch).
    n_frames = len(source)
    fb = job.params.get("frame_batch")
    fb = int(fb) if fb else _auto_frame_batch(source.spatial)
    fb = max(1, min(fb, n_frames))
    c_out = cfg.out_channels
    out_path = os.path.join(job.output, "enhanced.tif")
    writer = _append_writer(
        out_path,
        float(n_frames) * np.prod(source.spatial) * c_out
        * np.dtype(tc.probs_dtype).itemsize,
        _out_compression(job),
    )

    # every serving branch funnels through write_frame, so progress +
    # cancellation ride it: one check per enhanced frame
    rep = jobs_lib.ProgressReporter(job, n_frames)

    def write_frame(got):  # (H, W, C_out) float32
        with timer.phase("write"):
            for c in range(c_out):
                writer.append(got[..., c])
        rep.step()

    t0 = time.time()
    import jax

    try:
        with source:
            sp = job.params.get("spatial_parallel")
            if sp and jax.device_count() > 1:
                # giant enhancement frames sharded across chips: same halo
                # exchange as segmentation, generator head. ``true`` = all
                # chips per frame; integer S = S-way spatial x (n/S)-way
                # data-parallel HYBRID over a 2-D mesh
                import jax.numpy as jnp

                from sequitr_tpu import parallel
                from sequitr_tpu.parallel import spatial as spatial_lib

                n_dev = jax.device_count()
                s_ways = _spatial_ways(sp, n_dev, tc=tc)
                d_ways = n_dev // s_ways

                def _norm_one(f):
                    # single-channel frames stay (H, W): the sharded input
                    # spec has no channel axis for C_in == 1
                    if f.ndim == 2:
                        return infer_lib._normalize(f[..., None], tc)[..., 0]
                    return infer_lib._normalize(f, tc)

                if d_ways > 1 and n_frames > 1:
                    mesh2 = parallel.make_mesh2d((d_ways, s_ways))
                    try:
                        hy_enh = spatial_lib.hybrid_gan_enhance(
                            cfg, params, state, mesh2, source.spatial,
                            batch=d_ways, out_dtype=tc.probs_dtype,
                        )
                    except (ValueError, NotImplementedError) as e:
                        raise jobs_lib.JobError(str(e))
                    batch_norm = jax.jit(jax.vmap(_norm_one))
                    n_left = n_frames
                    for chunk in infer_lib._iter_read_ahead(
                        _reads_fail_fast(job, source.chunks(d_ways)), 2
                    ):
                        out = hy_enh(
                            params, state, batch_norm(jnp.asarray(chunk))
                        )
                        with timer.phase("fetch"):
                            got = np.asarray(out)
                        for k in range(min(d_ways, n_left)):
                            write_frame(got[k])
                        n_left -= d_ways
                else:
                    mesh = parallel.make_mesh(s_ways)
                    try:
                        sp_enh = spatial_lib.spatial_gan_enhance(
                            cfg, params, state, mesh, source.spatial,
                            out_dtype=tc.probs_dtype,
                        )
                    except (ValueError, NotImplementedError) as e:
                        raise jobs_lib.JobError(str(e))
                    norm_one = jax.jit(_norm_one)
                    for frame in infer_lib._iter_read_ahead(
                        _reads_fail_fast(job, source.frames()), 2
                    ):
                        out = sp_enh(params, state, norm_one(jnp.asarray(frame)))
                        with timer.phase("fetch"):
                            got = np.asarray(out)
                        write_frame(got)
            elif job.params.get("data_parallel") and jax.device_count() > 1:
                # frames sharded over all chips, weights replicated — the
                # same zero-traffic DP pattern as segmentation serving
                from sequitr_tpu import parallel

                mesh = parallel.make_mesh()
                n_dev = mesh.devices.size
                dp = parallel.make_dp_frame_mapper(
                    infer_lib.make_gan_enhancer(cfg, tc, source.spatial), mesh
                )
                n_left = n_frames
                for chunk in infer_lib._iter_read_ahead(
                    _reads_fail_fast(job, source.chunks(n_dev)), 2
                ):
                    import jax.numpy as jnp

                    out = dp(params, state, jnp.asarray(chunk))
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    for k in range(min(n_dev, n_left)):
                        write_frame(got[k])
                    n_left -= n_dev
            elif fb > 1:
                benhance = infer_lib.cached_gan_enhancer(
                    cfg, tc, source.spatial, batch=fb
                )
                n_left = n_frames
                for out in infer_lib.stream_frames(
                    lambda ch: benhance(params, state, ch),
                    _reads_fail_fast(job, source.chunks(fb)),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    for k in range(min(fb, n_left)):
                        write_frame(got[k])
                    n_left -= fb
            else:
                enhance = infer_lib.cached_gan_enhancer(cfg, tc, source.spatial)
                for out in infer_lib.stream_frames(
                    lambda f: enhance(params, state, f),
                    _reads_fail_fast(job, source.frames()),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    write_frame(got)
    except BaseException:
        writer.abort()
        raise
    writer.close()
    rep.finish()
    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), total_s=round(total_s, 4), n_frames=n_frames
    )
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    outputs = {"enhanced": out_path, "metrics": json.dumps(metrics)}
    if c_out > 1:
        outputs["enhanced_layout"] = (
            f"pages=(T={n_frames})*(C={c_out}), frame-major"
        )
    return outputs


@register("denoise")
def denoise(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Noise2Void denoising pass over a TIFF stack (kind ``n2v`` models).

    The serving half of ``train_n2v``: the regression U-Net runs the same
    fused normalize -> tiled forward -> stitch chain as the GAN enhancer
    (raw head, no softmax) and writes the predicted clean stack in
    normalized space. input: one TIFF per channel. params: model, patch,
    overlap, window, normalize, p_lo/p_hi, tta, out_dtype, frame_batch,
    frame range / roi, data_parallel (frames sharded over all chips).
    ``spatial_parallel`` is not supported here (denoisers are shallow;
    whole frames fit a chip — ask for it if a use case appears).
    Outputs: denoised.tif (float32 by default; multi-channel output is
    frame-major paged like the GAN's ``enhanced_layout``).

    A 3D model (``train_n2v`` with ``dims: 3``) routes to the volumetric
    branch: ONE volume-sequence entry (optional ``z`` pages per volume),
    each (Z, H, W) volume through the fused 3D graph, volume-major page
    output; ``data_parallel`` there shards TIMEPOINTS — one whole volume
    per chip per dispatch (``_denoise_volumes``).
    """
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.pipeline import infer as infer_lib

    if job.params.get("spatial_parallel"):
        raise jobs_lib.JobError(
            "denoise does not support spatial_parallel (frames this size "
            "fit one chip; use data_parallel for timelapse throughput)"
        )
    paths = _resolve_inputs(job)
    cfg, params, state = _require_model(job, config, "n2v")
    if cfg.dims == 3:
        return _denoise_volumes(job, config, cfg, params, state, paths)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))

    if cfg.in_channels != source.n_channels:
        raise jobs_lib.JobError(
            f"model expects {cfg.in_channels} channel(s), "
            f"got {source.n_channels} input stack(s)"
        )
    p = job.params.copy()
    if "out_dtype" in p:
        p["probs_dtype"] = p["out_dtype"]
    tc = _tile_config(
        p, dims=2,
        frame_spatial=source.spatial, min_multiple=cfg.min_input_multiple,
        exact_only=True, allow_polyphase=True,
    )
    if tc.polyphase:
        _require_polyphase_model(cfg)

    from sequitr_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    n_frames = len(source)
    fb = job.params.get("frame_batch")
    fb = int(fb) if fb else _auto_frame_batch(source.spatial)
    fb = max(1, min(fb, n_frames))
    c_out = cfg.num_classes
    out_path = os.path.join(job.output, "denoised.tif")
    writer = _append_writer(
        out_path,
        float(n_frames) * np.prod(source.spatial) * c_out
        * np.dtype(tc.probs_dtype).itemsize,
        _out_compression(job),
    )
    rep = jobs_lib.ProgressReporter(job, n_frames)

    def write_frame(got):  # (H, W, C_out)
        with timer.phase("write"):
            for c in range(c_out):
                writer.append(got[..., c])
        rep.step()

    t0 = time.time()
    import jax

    try:
        with source:
            if job.params.get("data_parallel") and jax.device_count() > 1:
                import jax.numpy as jnp

                from sequitr_tpu import parallel

                mesh = parallel.make_mesh()
                n_dev = mesh.devices.size
                dp = parallel.make_dp_frame_mapper(
                    infer_lib.make_denoiser(cfg, tc, source.spatial), mesh
                )
                n_left = n_frames
                for chunk in infer_lib._iter_read_ahead(
                    _reads_fail_fast(job, source.chunks(n_dev)), 2
                ):
                    out = dp(params, state, jnp.asarray(chunk))
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    for k in range(min(n_dev, n_left)):
                        write_frame(got[k])
                    n_left -= n_dev
            elif fb > 1:
                bdenoise = infer_lib.cached_denoiser(
                    cfg, tc, source.spatial, batch=fb
                )
                n_left = n_frames
                for out in infer_lib.stream_frames(
                    lambda ch: bdenoise(params, state, ch),
                    _reads_fail_fast(job, source.chunks(fb)),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    for k in range(min(fb, n_left)):
                        write_frame(got[k])
                    n_left -= fb
            else:
                den = infer_lib.cached_denoiser(cfg, tc, source.spatial)
                for out in infer_lib.stream_frames(
                    lambda f: den(params, state, f),
                    _reads_fail_fast(job, source.frames()),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out)
                    write_frame(got)
    except BaseException:
        writer.abort()
        raise
    writer.close()
    rep.finish()
    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), total_s=round(total_s, 4), n_frames=n_frames
    )
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    outputs = {"denoised": out_path, "metrics": json.dumps(metrics)}
    if c_out > 1:
        outputs["denoised_layout"] = (
            f"pages=(T={n_frames})*(C={c_out}), frame-major"
        )
    return outputs


def _evaluate_denoise_volumes(job, config, cfg, params, state, paths):
    """Volumetric branch of ``evaluate_denoise`` (``dims == 3`` models).

    input: [noisy volume-sequence entry, clean volume-sequence entry]
    (each a dir/glob/file; the ``z`` pages-per-volume param applies to
    BOTH). Per-volume PSNR/L1 in the job's normalize space, plus the
    noisy input's own PSNR — same contract as the 2D branch, one volume
    per dispatch.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.pipeline import infer as infer_lib

    if len(paths) != 2:
        raise jobs_lib.JobError(
            f"3D evaluate_denoise takes [noisy entry, clean entry] "
            f"(the model is single-channel), got {len(paths)} input(s)"
        )
    z_pages = _parse_z_pages(job)
    try:
        source = VolumeSequence(paths[0], z=z_pages)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        tsource = VolumeSequence(paths[1], z=z_pages)
    except ValueError as e:
        source.close()
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        if (len(source),) + source.spatial != (len(tsource),) + tsource.spatial:
            raise jobs_lib.JobError(
                f"noisy/clean shape mismatch: "
                f"{(len(source),) + source.spatial} "
                f"vs {(len(tsource),) + tsource.spatial}"
            )
        tc = _tile_config(
            job.params, dims=3,
            frame_spatial=source.spatial,
            min_multiple=cfg.min_input_multiple,
            exact_only=True,
        )
    except BaseException:
        source.close()
        tsource.close()
        raise
    den = infer_lib.cached_denoiser(cfg, tc, source.spatial)

    @jax.jit
    def denoise_and_norm(vol):
        out = den(params, state, vol)
        return out, infer_lib._normalize(vol[..., None], tc)

    @jax.jit
    def norm_vol(vol):
        return infer_lib._normalize(vol[..., None], tc)

    n_vols = len(source)
    psnrs, l1s, psnrs_in = [], [], []
    with source, tsource:
        tvols = _reads_fail_fast(job, tsource.volumes())
        for out, x01 in jobs_lib.track(
            job,
            infer_lib.stream_frames(
                lambda v: denoise_and_norm(jnp.asarray(v, jnp.float32)),
                _reads_fail_fast(job, source.volumes()),
                prefetch_host=lambda res: [
                    infer_lib._copy_to_host_async(a) for a in res
                ],
            ),
            total=n_vols, phase="volumes",
        ):
            t01 = np.asarray(
                norm_vol(jnp.asarray(next(tvols), jnp.float32)),
                dtype=np.float32,
            )
            out = np.asarray(out, dtype=np.float32)
            x01 = np.asarray(x01, dtype=np.float32)
            err = out - t01
            l1s.append(float(np.mean(np.abs(err))))
            mse = float(np.mean(err * err))
            psnrs.append(
                round(10.0 * float(np.log10(1.0 / max(mse, 1e-12))), 4)
            )
            mse_in = float(np.mean((x01 - t01) ** 2))
            psnrs_in.append(
                round(10.0 * float(np.log10(1.0 / max(mse_in, 1e-12))), 4)
            )

    metrics = {
        "l1": round(float(np.mean(l1s)), 6),
        "psnr": round(float(np.mean(psnrs)), 4),
        "psnr_noisy_input": round(float(np.mean(psnrs_in)), 4),
        "per_volume_psnr": psnrs,
        "n_volumes": n_vols,
    }
    return {"metrics": json.dumps(metrics)}


def _denoise_volumes(job, config, cfg, params, state, paths):
    """Volumetric branch of ``denoise`` (kind ``n2v``, ``dims == 3``).

    ONE volume-sequence entry in (per-timepoint z-stack files, or a
    single file with the ``z`` pages-per-volume param); each (Z, H, W)
    volume runs the fused 3D regression graph (whole-volume when it fits
    the HBM budget, else the default 3D tiling) and the denoised planes
    append to one page stack — ``frame_range`` selects timepoints,
    progress/cancellation per volume.

    ``data_parallel: true`` shards TIMEPOINTS over the mesh — each chip
    denoises one whole volume per dispatch (zero inter-chip traffic; the
    batch axis is T, not Z, so per-volume semantics are untouched). Host
    memory holds n_devices volumes per read-ahead slot.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.pipeline import infer as infer_lib
    from sequitr_tpu.utils import PhaseTimer

    if job.params.get("roi") is not None:
        raise jobs_lib.JobError("roi serving is 2D-only (crop the volume upstream)")
    if job.params.get("frame_batch"):
        # loud like roi/data_parallel: volumes stream one at a time, and a
        # silently-ignored throughput knob reads as "batching is on"
        raise jobs_lib.JobError(
            "3D denoise does not take frame_batch (volumes stream one at "
            "a time; a whole volume already fills a dispatch)"
        )
    if len(paths) != 1:
        raise jobs_lib.JobError(
            f"3D denoise takes ONE volume-sequence entry (the model is "
            f"single-channel), got {len(paths)}"
        )
    try:
        source = VolumeSequence(paths[0], z=_parse_z_pages(job))
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        # a warm worker must not leak the sequence's fd when a later
        # parameter check rejects the job (VolumeSequence's own rule)
        source = _apply_frame_range(job, source)
        p = job.params.copy()
        if "out_dtype" in p:
            p["probs_dtype"] = p["out_dtype"]
        tc = _tile_config(
            p, dims=3,
            frame_spatial=source.spatial,
            min_multiple=cfg.min_input_multiple,
            exact_only=True,
        )
    except BaseException:
        source.close()
        raise
    n_vols = len(source)
    out_path = os.path.join(job.output, "denoised.tif")
    writer = _append_writer(
        out_path,
        float(n_vols) * np.prod(source.spatial)
        * np.dtype(tc.probs_dtype).itemsize,
        _out_compression(job),
    )
    timer = PhaseTimer()
    t0 = time.time()

    def write_volume(vol):  # (Z, H, W)
        with timer.phase("write"):
            for plane in vol:
                writer.append(plane)

    try:
        with source:
            if job.params.get("data_parallel") and jax.device_count() > 1:
                from sequitr_tpu import parallel

                mesh = parallel.make_mesh()
                n_dev = mesh.devices.size
                dp = parallel.make_dp_frame_mapper(
                    infer_lib.make_denoiser(cfg, tc, source.spatial), mesh
                )
                # _dp_chunk_stream owns read-ahead, per-chunk progress/
                # cancel, fail-fast reads, and the tail-padding count
                for chunk, n_real in _dp_chunk_stream(
                    job, source.chunks(n_dev), n_vols, n_dev,
                    phase="volumes",
                ):
                    out = dp(params, state, jnp.asarray(chunk, jnp.float32))
                    with timer.phase("fetch"):
                        got = np.asarray(out)[..., 0]  # (D, Z, H, W)
                    for k in range(n_real):
                        write_volume(got[k])
            else:
                rep = jobs_lib.ProgressReporter(job, n_vols)
                den = infer_lib.cached_denoiser(cfg, tc, source.spatial)
                for out in infer_lib.stream_frames(
                    lambda v: den(params, state, jnp.asarray(v, jnp.float32)),
                    _reads_fail_fast(job, source.volumes()),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out)[..., 0]  # (Z, H, W)
                    write_volume(got)
                    rep.step()
                rep.finish()
    except BaseException:
        writer.abort()
        raise
    writer.close()
    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), total_s=round(total_s, 4), n_volumes=n_vols
    )
    if total_s > 0:
        metrics["volumes_per_sec"] = round(n_vols / total_s, 3)
    outputs = {"denoised": out_path, "metrics": json.dumps(metrics)}
    if n_vols > 1:
        outputs["denoised_layout"] = (
            f"pages=(T={n_vols})*(Z={source.spatial[0]}), volume-major"
        )
    return outputs


@register("evaluate_denoise")
def evaluate_denoise(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Score a Noise2Void model against clean reference frames.

    N2V trains without clean data, but labs often HAVE a few
    high-exposure/averaged calibration frames — this is the job that
    closes the loop on them (the serving-time counterpart of fit_n2v's
    masked-MSE holdout, which can only floor at the noise variance).
    input: the model's ``in_channels`` noisy channel stacks followed by
    the same number of clean stacks (single-channel: [noisy.tif,
    clean.tif], same (T, H, W)). params: model, tiling params,
    frame_batch, normalize (applied to BOTH sides so the L1/PSNR compare
    matched intensity spaces — use "none" for pre-scaled data, matching
    how the model was trained). Outputs mean L1/PSNR + per-frame PSNR,
    and the same metrics for the raw noisy input (the improvement is the
    difference). Mirrors ``evaluate_gan``'s contract.

    A 3D model routes to the volumetric branch: input = [noisy entry,
    clean entry] volume sequences (``z`` pages param applies to both),
    per-volume PSNR (``_evaluate_denoise_volumes``).
    """
    import jax

    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.pipeline import infer as infer_lib

    import jax.numpy as jnp

    paths = _resolve_inputs(job)
    cfg, params, state = _require_model(job, config, "n2v")
    if cfg.dims == 3:
        return _evaluate_denoise_volumes(job, config, cfg, params, state, paths)
    want = 2 * cfg.in_channels
    if len(paths) != want:
        raise jobs_lib.JobError(
            f"job {job.id}: model needs {cfg.in_channels} noisy channel "
            f"stack(s) then {cfg.in_channels} clean stack(s) "
            f"({want} paths), got {len(paths)}"
        )
    try:
        source = FrameSource(paths=paths[: cfg.in_channels])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        tsource = FrameSource(paths=paths[cfg.in_channels:])
    except ValueError as e:
        source.close()
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    try:
        # close both lazy readers when a validation check rejects the job
        # (warm workers must not leak fds on malformed submissions)
        if (
            (len(source),) + source.spatial
            != (len(tsource),) + tsource.spatial
        ):
            raise jobs_lib.JobError(
                f"noisy/clean shape mismatch: "
                f"{(len(source),) + source.spatial} "
                f"vs {(len(tsource),) + tsource.spatial}"
            )
        # NOTE: no out_dtype -> probs_dtype mapping here. This job writes
        # no image; quantizing the predictions before PSNR/L1 (e.g. a
        # copy-pasted out_dtype: "uint16") would silently corrupt the
        # metrics of a "successful" run.
        tc = _tile_config(
            job.params, dims=2,
            frame_spatial=source.spatial,
            min_multiple=cfg.min_input_multiple,
            exact_only=True,
        )
    except BaseException:
        source.close()
        tsource.close()
        raise
    n_frames = len(source)
    fb = job.params.get("frame_batch")
    fb = int(fb) if fb else _auto_frame_batch(source.spatial)
    fb = max(1, min(fb, n_frames))
    bdenoise = infer_lib.cached_denoiser(cfg, tc, source.spatial, batch=fb)

    @jax.jit
    def denoise_and_norm(chunk):
        out = bdenoise(params, state, chunk)

        def one(t):
            t = t[..., None] if t.ndim == 2 else t
            return infer_lib._normalize(t, tc)

        return out, jax.vmap(one)(chunk)

    @jax.jit
    def norm_chunk(chunk):
        def one(t):
            t = t[..., None] if t.ndim == 2 else t
            return infer_lib._normalize(t, tc)

        return jax.vmap(one)(chunk)

    psnrs, l1s, psnrs_in = [], [], []
    n_left = n_frames
    with source, tsource:
        tchunks = _reads_fail_fast(job, tsource.chunks(fb))
        # same read-ahead treatment as evaluate_gan: chunk t+1's disk
        # read overlaps chunk t's H2D + compute
        for out, x01 in jobs_lib.track(
            job,
            infer_lib.stream_frames(
                denoise_and_norm,
                _reads_fail_fast(job, source.chunks(fb)),
                prefetch_host=lambda res: [
                    infer_lib._copy_to_host_async(a) for a in res
                ],
            ),
            total=-(-n_frames // fb), phase="chunks",
        ):
            out = np.asarray(out, dtype=np.float32)
            x01 = np.asarray(x01, dtype=np.float32)
            t01 = np.asarray(norm_chunk(jnp.asarray(next(tchunks))),
                             dtype=np.float32)
            for k in range(min(fb, n_left)):
                err = out[k] - t01[k]
                l1s.append(float(np.mean(np.abs(err))))
                mse = float(np.mean(err * err))
                psnrs.append(
                    round(10.0 * float(np.log10(1.0 / max(mse, 1e-12))), 4)
                )
                mse_in = float(np.mean((x01[k] - t01[k]) ** 2))
                psnrs_in.append(
                    round(10.0 * float(np.log10(1.0 / max(mse_in, 1e-12))), 4)
                )
            n_left -= fb

    metrics = {
        "l1": round(float(np.mean(l1s)), 6),
        "psnr": round(float(np.mean(psnrs)), 4),
        "psnr_noisy_input": round(float(np.mean(psnrs_in)), 4),
        "per_frame_psnr": psnrs,
        "n_frames": n_frames,
    }
    return {"metrics": json.dumps(metrics)}


@register("evaluate_gan")
def evaluate_gan(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Score a GAN enhancement model against clean target frames.

    input: the model's ``in_channels`` raw channel stacks followed by its
    ``out_channels`` target stacks (single-channel models: [raw.tif,
    target.tif], same (T, H, W)). params: model, tiling params,
    frame_batch. Outputs mean L1 and PSNR over the normalized [0, 1]
    frames plus per-frame PSNR — the serving-time counterpart of the GAN
    train jobs' holdout eval (fit._make_gan_evaluator). Runs through the
    same cached, frame-batched, H2D-overlapped machinery as
    ``enhancement_gan``.
    """
    import jax

    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.pipeline import infer as infer_lib

    paths = _resolve_inputs(job)
    # the model determines the input split, so load it first
    cfg0, _, _ = _require_model(job, config, "gan")
    want = cfg0.in_channels + cfg0.out_channels
    if len(paths) != want:
        raise jobs_lib.JobError(
            f"job {job.id}: model needs {cfg0.in_channels} raw channel "
            f"stack(s) then {cfg0.out_channels} target stack(s) "
            f"({want} paths), got {len(paths)}"
        )
    try:
        source = FrameSource(paths=paths[: cfg0.in_channels])
        tsource = FrameSource(paths=paths[cfg0.in_channels :])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    if (len(source),) + source.spatial != (len(tsource),) + tsource.spatial:
        raise jobs_lib.JobError(
            f"raw/target shape mismatch: {(len(source),) + source.spatial} "
            f"vs {(len(tsource),) + tsource.spatial}"
        )

    cfg, params, state, tc = _gan_setup(job, config, source)

    n_frames = len(source)
    fb = job.params.get("frame_batch")
    fb = int(fb) if fb else _auto_frame_batch(source.spatial)
    fb = max(1, min(fb, n_frames))
    benhance = infer_lib.cached_gan_enhancer(cfg, tc, source.spatial, batch=fb)

    # targets go through the SAME normalize mode as the raw frames (the
    # job's `normalize` param is honored on both sides), so L1/PSNR always
    # compare matched intensity spaces
    @jax.jit
    def norm_targets(chunk):
        def one(t):
            t = t[..., None] if t.ndim == 2 else t
            return infer_lib._normalize(t, tc)

        return jax.vmap(one)(chunk)

    psnrs = []
    l1s = []
    n_left = n_frames
    with source, tsource:
        tchunks = _reads_fail_fast(job, tsource.chunks(fb))
        for out in jobs_lib.track(
            job,
            infer_lib.stream_frames(
                lambda ch: benhance(params, state, ch),
                _reads_fail_fast(job, source.chunks(fb)),
                prefetch_host=infer_lib._copy_to_host_async,
            ),
            total=-(-n_frames // fb), phase="chunks",
        ):
            t01 = np.asarray(norm_targets(next(tchunks)), dtype=np.float32)
            fake = np.asarray(out, dtype=np.float32)
            for k in range(min(fb, n_left)):
                err = fake[k] - t01[k]
                l1s.append(float(np.mean(np.abs(err))))
                mse = float(np.mean(err * err))
                psnrs.append(
                    round(10.0 * float(np.log10(1.0 / max(mse, 1e-12))), 4)
                )
            n_left -= fb

    metrics = {
        "l1": round(float(np.mean(l1s)), 6),
        "psnr": round(float(np.mean(psnrs)), 4),
        "per_frame_psnr": psnrs,
        "n_frames": n_frames,
    }
    return {"metrics": json.dumps(metrics)}
