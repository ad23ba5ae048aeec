"""Optics/PSF pipelines: localization, deconvolution, illumination.

Split out of ``server.py`` (round-5 verdict item 4): ``localize_emitters``
(2D / volumetric / astigmatic-z), ``calibrate_astigmatism``, ``deconvolve``
(Richardson-Lucy) and ``correct_illumination`` (flat-field + photobleach).
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
    _append_writer,
    _apply_frame_range,
    _apply_roi,
    _dp_chunk_stream,
    _expand_inputs_entry,
    _out_compression,
    _parse_z_pages,
    _read_stack_or_fail,
    _reads_fail_fast,
    _resolve_inputs,
    _robust_threshold,
    _volume_chunks,
    register,
)

import logging
log = logging.getLogger("sequitr_tpu.server")

@register("localize_emitters")
def localize_emitters_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Single-molecule sub-pixel emitter localization over a TIFF stack.

    Exposes the PSF subsystem (SURVEY.md §2 'PSF modelling';
    ``psf.localize_emitters``: max-pool NMS detection + vmapped
    Gaussian-mask fits, <0.01 px on synthetic emitters) through the job
    API — no model required. params: ``threshold`` (absolute intensity)
    or ``threshold_sigmas`` (robust per-frame: median + k*MAD, default 5),
    ``max_peaks``, ``min_distance``, ``window``, ``sigma``.
    Outputs: emitters.csv with columns t,y,x,amplitude,background
    (sub-pixel y/x, brightest-first within each frame); ``btrack: true``
    additionally writes objects.h5 in btrack's object layout so the
    localizations feed straight into single-particle tracking (the same
    handoff the segmentation pipelines use for cells).

    3D MODES (both emit a z column in emitters.csv and fill the btrack
    z coordinate, so track_objects links in full xyz):

    * ``dims: 3`` — TRUE VOLUMETRIC localization over volumes
      (``psf.localize_emitters_3d``: 3D max-pool NMS + anisotropic
      Gaussian-mask centroids). Inputs follow the volume-timelapse
      convention (directory/glob = one z-stack file per timepoint, or a
      single T·Z-page file with ``z`` pages-per-volume; a bare single
      file is a one-volume sequence). Extra params: ``min_distance_z``,
      ``window_z``, ``sigma_z``; z is in voxels.
    * ``astigmatism: <calibration>`` — single-frame 3D via a
      cylindrical-lens width-vs-z calibration (elliptical fits +
      calibration-curve inversion, ``psf.localize_emitters_astig``).
      The value is a calibration-JSON path, the OUTPUT DIRECTORY of a
      ``calibrate_astigmatism`` job (chains via ``depends_on``), or an
      inline ``{qx, qy, z_range, window}`` dict. z is in calibration
      units (whatever the bead scan's stage positions used); the csv
      additionally carries sigma_y/sigma_x. 2D frame streams only.

    ``z_scale`` (default 1.0) multiplies z ONLY in the btrack export so
    z lands in xy-pixel units there (e.g. nm-per-z-unit / nm-per-pixel
    for astigmatism, z-step / pixel size for anisotropic voxels) —
    track_objects gates on euclidean xyz distance, so mixed units would
    mis-weight the axial term. emitters.csv keeps native units.

    ``data_parallel: true`` shards the work over all chips of the mesh —
    per-frame/per-timepoint localization is embarrassingly parallel, so
    each chip runs detect+fit on its shard with zero inter-chip traffic
    (plain 2D: frames via ``parallel.make_dp_localizer``; astigmatic:
    frames via ``make_dp_localizer_astig`` — the calibration closes over
    each chip's graph as constants; dims=3: TIMEPOINTS via
    ``make_dp_localizer3d``); per-frame robust thresholds are traced
    operands. Output identical to streaming in every mode.
    """
    from sequitr_tpu import psf
    from sequitr_tpu.data.source import FrameSource

    (path,) = _resolve_inputs(job)[:1]
    p = job.params
    dims = int(p.get("dims", 2))
    calib = _load_astig_calibration(job)
    use_dp = bool(p.get("data_parallel"))
    if dims == 3 and calib is not None:
        raise jobs_lib.JobError(
            "astigmatism infers z from 2D frames; it does not combine "
            "with dims=3 volumetric input"
        )
    if dims == 3:
        if p.get("roi") is not None:
            raise jobs_lib.JobError("roi localization is 2D-only")
        return _localize_volume_timelapse(job, path)
    if dims != 2:
        raise jobs_lib.JobError(f"dims={dims} (expected 2 or 3)")

    try:
        # lazy per-frame ingest like the other serving pipelines; rows
        # stream into emitters.csv as each frame is processed
        source = FrameSource(paths=[path])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read {path}: {e}")
    source = _apply_roi(job, _apply_frame_range(job, source))

    max_peaks = int(p.get("max_peaks", 256))
    min_distance = int(p.get("min_distance", 2))
    window = int(p.get("window", 7))
    # astig: an explicit window overrides; None = the calibration's own
    # fit window (truncation bias cancels). Computed ONCE so the DP and
    # streaming branches cannot diverge.
    astig_window = window if "window" in p else None
    sigma = float(p.get("sigma", 1.5))
    thr_abs = p.get("threshold")
    k_sig = float(p.get("threshold_sigmas", 5.0))
    want_btrack = bool(p.get("btrack"))
    z_scale = float(p.get("z_scale", 1.0))
    if calib is not None and want_btrack and "z_scale" not in p:
        # calibration z is typically nm while x/y are pixels; an unscaled
        # mix makes track_objects' euclidean gate axial-dominated
        job.runtime_warnings.append(
            "astigmatism z is in calibration units but btrack x/y are in "
            "pixels; set z_scale (multiplied into z for the btrack export, "
            "e.g. 1/pixel_size_nm for z in nm) so tracking gates on "
            "consistent units"
        )
    n_frames = len(source)

    from sequitr_tpu.pipeline import infer as infer_lib

    out_path = os.path.join(job.output, "emitters.csv")
    tmp = out_path + ".tmp"
    n_rows = 0
    tables = [] if want_btrack else None
    if calib is not None:
        header = "t,z,y,x,sigma_y,sigma_x,amplitude,background\n"
    else:
        header = "t,y,x,amplitude,background\n"
    def _emit_plain(f, t, ys, xs, amps, bgs):
        """One frame's plain-mode rows + optional btrack table entry."""
        nonlocal_rows = 0
        for y, x, a, b in zip(ys, xs, amps, bgs):
            f.write(f"{t},{y:.4f},{x:.4f},{a:.4f},{b:.4f}\n")
            nonlocal_rows += 1
        if tables is not None:
            from sequitr_tpu import localize as loc_lib

            coords = np.zeros((len(ys), 5), dtype=np.float32)
            coords[:, 0] = t
            coords[:, 1] = xs
            coords[:, 2] = ys
            tables.append(
                loc_lib.FrameTable(
                    coords=coords,
                    area=np.ones(len(ys), np.int32),
                    intensity_mean=np.asarray(amps, np.float32),
                )
            )
        return nonlocal_rows

    def _emit_astig(f, t, zs, ys, xs, sy, sx, amps, bgs):
        """One frame's astigmatic rows + optional btrack table entry
        (shared by the streaming and DP paths so they cannot diverge in
        format or z_scale handling)."""
        count = 0
        for z, y, x, wy, wx, a, b in zip(zs, ys, xs, sy, sx, amps, bgs):
            f.write(
                f"{t},{z:.4f},{y:.4f},{x:.4f},{wy:.4f},"
                f"{wx:.4f},{a:.4f},{b:.4f}\n"
            )
            count += 1
        if tables is not None:
            from sequitr_tpu import localize as loc_lib

            coords = np.zeros((len(ys), 5), dtype=np.float32)
            coords[:, 0] = t
            coords[:, 1] = np.asarray(xs)
            coords[:, 2] = np.asarray(ys)
            coords[:, 3] = np.asarray(zs) * z_scale
            tables.append(
                loc_lib.FrameTable(
                    coords=coords,
                    area=np.ones(len(ys), np.int32),
                    intensity_mean=np.asarray(amps, np.float32),
                )
            )
        return count

    import jax

    dp_devices = 0
    try:
        with source, open(tmp, "w") as f:
            f.write(header)
            if use_dp and jax.device_count() > 1:
                # frames sharded over all chips, zero inter-chip traffic
                # — the same embarrassingly parallel DP shape as
                # first-mode registration and GAN serving
                import jax.numpy as jnp

                from sequitr_tpu import parallel

                mesh = parallel.make_mesh()
                n_dev = dp_devices = int(mesh.devices.size)
                if calib is not None:
                    dp = parallel.make_dp_localizer_astig(
                        mesh, calib, max_peaks=max_peaks,
                        min_distance=min_distance,
                        window=astig_window,
                    )
                else:
                    dp = parallel.make_dp_localizer(
                        mesh, max_peaks=max_peaks,
                        min_distance=min_distance,
                        window=window, sigma=sigma,
                    )
                done = 0
                for chunk, n_real in _dp_chunk_stream(
                    job, source.chunks(n_dev), n_frames, n_dev
                ):
                    chunk = np.asarray(chunk, np.float32)
                    thrs = np.asarray(
                        [_robust_threshold(fr, thr_abs, k_sig)
                         for fr in chunk],
                        np.float32,
                    )
                    _, valid, fits = dp(
                        jnp.asarray(chunk), jnp.asarray(thrs)
                    )
                    valid = np.asarray(valid)
                    host = {k: np.asarray(v) for k, v in fits.items()}
                    for k in range(n_real):
                        m = valid[k]
                        t_abs = source.frame_offset + done
                        if calib is not None:
                            n_rows += _emit_astig(
                                f, t_abs,
                                host["z"][k][m], host["y"][k][m],
                                host["x"][k][m], host["sigma_y"][k][m],
                                host["sigma_x"][k][m],
                                host["amplitude"][k][m],
                                host["background"][k][m],
                            )
                        else:
                            n_rows += _emit_plain(
                                f, t_abs,
                                host["y"][k][m], host["x"][k][m],
                                host["amplitude"][k][m],
                                host["background"][k][m],
                            )
                        done += 1
            else:
                frames = jobs_lib.track(
                    job, infer_lib._iter_read_ahead(source.frames(), 2),
                    total=n_frames,
                )
                stream = _reads_fail_fast(job, enumerate(frames))
                for rel_t, frame in stream:
                    t = rel_t + source.frame_offset  # absolute frame index
                    frame = np.asarray(frame, dtype=np.float32)
                    thr = _robust_threshold(frame, thr_abs, k_sig)
                    if calib is not None:
                        fits = psf.localize_emitters_astig(
                            frame, thr, calib, max_peaks=max_peaks,
                            min_distance=min_distance,
                            window=astig_window,
                        )
                    else:
                        fits = psf.localize_emitters(
                            frame, thr, max_peaks=max_peaks,
                            min_distance=min_distance, window=window,
                            sigma=sigma,
                        )
                        n_rows += _emit_plain(
                            f, t, fits["y"], fits["x"],
                            fits["amplitude"], fits["background"],
                        )
                        continue
                    n_rows += _emit_astig(
                        f, t,
                        np.asarray(fits["z"], np.float64),
                        np.asarray(fits["y"], np.float64),
                        np.asarray(fits["x"], np.float64),
                        np.asarray(fits["sigma_y"], np.float64),
                        np.asarray(fits["sigma_x"], np.float64),
                        np.asarray(fits["amplitude"], np.float64),
                        np.asarray(fits["background"], np.float64),
                    )
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    os.replace(tmp, out_path)
    outputs = {
        "emitters": out_path,
        "n_emitters": str(n_rows),
        "n_frames": str(n_frames),
    }
    if dp_devices:
        outputs["n_devices"] = str(dp_devices)
    if tables is not None:
        from sequitr_tpu import localize as loc_lib

        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=source.frame_offset + n_frames
        )
        outputs["objects"] = h5_path
    return outputs


def _load_astig_calibration(job: Job):
    """Resolve the ``astigmatism`` param to an AstigCalibration (or None).

    Accepts a calibration-JSON path, a directory holding
    ``astig_calibration.json`` (the output dir of a
    ``calibrate_astigmatism`` job — lets workflows chain calibrate ->
    localize through plain ``depends_on``), or an inline dict.
    """
    from sequitr_tpu import psf

    astig = job.params.get("astigmatism")
    if astig is None:
        return None
    if isinstance(astig, dict):
        try:
            return psf.AstigCalibration.from_dict(astig)
        except (TypeError, ValueError) as e:
            raise jobs_lib.JobError(f"job {job.id}: bad astigmatism: {e}")
    if not isinstance(astig, str):
        raise jobs_lib.JobError(
            f"job {job.id}: astigmatism must be a calibration path or "
            f"dict, got {type(astig).__name__}"
        )
    path = astig
    if os.path.isdir(path):
        path = os.path.join(path, "astig_calibration.json")
    try:
        return psf.AstigCalibration.from_json(path)
    # TypeError: structurally wrong JSON (e.g. "qx": 1 hits len() on an
    # int) — as deterministic as a ValueError, must not burn retries
    except (OSError, TypeError, ValueError, json.JSONDecodeError) as e:
        raise jobs_lib.JobError(
            f"job {job.id}: cannot load astigmatism calibration "
            f"{astig!r}: {e}"
        )


def _localize_volume_timelapse(job: Job, path: str) -> Dict[str, str]:
    """dims=3 body of ``localize_emitters``: volumetric detection+fitting
    per (Z, H, W) timepoint of a volume sequence through one cached jit
    graph; rows stream into emitters.csv (t,z,y,x in voxels)."""
    from sequitr_tpu import psf
    from sequitr_tpu.data.source import VolumeSequence

    p = job.params
    try:
        seq = VolumeSequence(path, z=_parse_z_pages(job))
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    seq = _apply_frame_range(job, seq)

    max_peaks = int(p.get("max_peaks", 256))
    min_distance = int(p.get("min_distance", 2))
    min_distance_z = int(p.get("min_distance_z", 1))
    window = int(p.get("window", 7))
    window_z = int(p.get("window_z", 5))
    sigma = float(p.get("sigma", 1.5))
    sigma_z = float(p.get("sigma_z", sigma))
    thr_abs = p.get("threshold")
    k_sig = float(p.get("threshold_sigmas", 5.0))
    want_btrack = bool(p.get("btrack"))
    z_scale = float(p.get("z_scale", 1.0))
    n_t = len(seq)

    out_path = os.path.join(job.output, "emitters.csv")
    tmp = out_path + ".tmp"
    n_rows = 0
    tables = [] if want_btrack else None
    from sequitr_tpu.pipeline import infer as infer_lib

    def _emit3d(f, t, zs, ys, xs, amps, bgs):
        """One timepoint's rows + optional btrack table entry."""
        count = 0
        for z, y, x, a, b in zip(zs, ys, xs, amps, bgs):
            f.write(f"{t},{z:.4f},{y:.4f},{x:.4f},{a:.4f},{b:.4f}\n")
            count += 1
        if tables is not None:
            from sequitr_tpu import localize as loc_lib

            coords = np.zeros((len(ys), 5), dtype=np.float32)
            coords[:, 0] = t
            coords[:, 1] = xs
            coords[:, 2] = ys
            coords[:, 3] = np.asarray(zs) * z_scale
            tables.append(
                loc_lib.FrameTable(
                    coords=coords,
                    area=np.ones(len(ys), np.int32),
                    intensity_mean=np.asarray(amps, np.float32),
                )
            )
        return count

    import jax

    use_dp = bool(p.get("data_parallel")) and jax.device_count() > 1
    dp_devices = 0
    try:
        with open(tmp, "w") as f:
            f.write("t,z,y,x,amplitude,background\n")
            if use_dp:
                # timepoints sharded over the mesh: a volumetric SMLM
                # timelapse is embarrassingly parallel over t exactly
                # like 2D frames (zero inter-chip traffic)
                import jax.numpy as jnp

                from sequitr_tpu import parallel

                mesh = parallel.make_mesh()
                n_dev = dp_devices = int(mesh.devices.size)
                dp = parallel.make_dp_localizer3d(
                    mesh, max_peaks=max_peaks, min_distance=min_distance,
                    min_distance_z=min_distance_z, window=window,
                    window_z=window_z, sigma=sigma, sigma_z=sigma_z,
                )
                done = 0
                for chunk, n_real in _dp_chunk_stream(
                    job, _volume_chunks(seq, n_dev), n_t, n_dev
                ):
                    thrs = np.asarray(
                        [_robust_threshold(v, thr_abs, k_sig)
                         for v in chunk],
                        np.float32,
                    )
                    _, valid, fits = dp(
                        jnp.asarray(chunk), jnp.asarray(thrs)
                    )
                    valid = np.asarray(valid)
                    host = {k: np.asarray(v) for k, v in fits.items()}
                    for k in range(n_real):
                        m = valid[k]
                        n_rows += _emit3d(
                            f, seq.frame_offset + done,
                            host["z"][k][m], host["y"][k][m],
                            host["x"][k][m], host["amplitude"][k][m],
                            host["background"][k][m],
                        )
                        done += 1
            else:
                # read-ahead: volume t+1's disk read/decode overlaps
                # volume t's localization dispatch, like every 2D
                # serving loop; producer read ValueErrors re-raise at
                # next()
                vol_iter = jobs_lib.track(
                    job, infer_lib._iter_read_ahead(seq.volumes(), 2),
                    total=n_t, phase="volumes",
                )
                for rel_t, vol in _reads_fail_fast(
                    job, enumerate(vol_iter)
                ):
                    t = rel_t + seq.frame_offset
                    vol = np.asarray(vol, dtype=np.float32)
                    thr = _robust_threshold(vol, thr_abs, k_sig)
                    fits = psf.localize_emitters_3d(
                        vol, thr, max_peaks=max_peaks,
                        min_distance=min_distance,
                        min_distance_z=min_distance_z,
                        window=window, window_z=window_z,
                        sigma=sigma, sigma_z=sigma_z,
                    )
                    n_rows += _emit3d(
                        f, t, fits["z"], fits["y"], fits["x"],
                        fits["amplitude"], fits["background"],
                    )
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    finally:
        seq.close()
    os.replace(tmp, out_path)
    outputs = {
        "emitters": out_path,
        "n_emitters": str(n_rows),
        "n_frames": str(n_t),
    }
    if dp_devices:
        outputs["n_devices"] = str(dp_devices)
    if tables is not None:
        from sequitr_tpu import localize as loc_lib

        h5_path = os.path.join(job.output, "objects.h5")
        loc_lib.export_btrack_h5_tables(
            h5_path, tables, n_frames=seq.frame_offset + n_t
        )
        outputs["objects"] = h5_path
    return outputs


@register("calibrate_astigmatism")
def calibrate_astigmatism_job(
    job: Job, config: ServerConfiguration
) -> Dict[str, str]:
    """Fit an astigmatic width-vs-z calibration from a bead z-scan.

    input: [bead_scan.tif] — a (Z, H, W) stack, one 2D frame of an
    isolated bead per known stage position (the standard cylindrical-lens
    calibration acquisition). The stage positions come from either
    ``z_positions`` (explicit list) or ``z_start`` + ``z_step`` (uniform
    scan); units are the user's (nm/µm) and carry through to every z the
    calibration ever produces. params: ``window`` (elliptical-fit crop,
    default 15 — measured 6.8x the axial accuracy of 11 on synthetic defocus series, BASELINE.md round 4; defocused spots need the wider crop), ``min_distance``, ``iterations``.

    Outputs ``astig_calibration.json`` ({qx, qy, z_range, window} — the
    exact file ``localize_emitters`` accepts via its ``astigmatism``
    param; point that param at THIS JOB'S OUTPUT DIR to chain with
    ``depends_on``) plus a self-check metric: the per-plane measured
    widths are inverted back through the fitted curves
    (``psf.z_from_widths``) and the round-trip z residual RMSE is
    reported — a large residual means the scan does not follow the
    quadratic defocus model (wrong z ordering, multiple beads, drift).
    """
    from sequitr_tpu import psf

    (path,) = _resolve_inputs(job)[:1]
    stack = _read_stack_or_fail(job, path)
    if stack.ndim != 3:
        raise jobs_lib.JobError(
            f"bead scan must be a (Z, H, W) stack, got {stack.shape}"
        )
    p = job.params
    zp = p.get("z_positions")
    if zp is not None:
        try:
            zs = np.asarray([float(v) for v in zp], dtype=np.float64)
        except (TypeError, ValueError):
            raise jobs_lib.JobError(f"bad z_positions: {zp!r}")
    elif "z_step" in p:
        try:
            z0 = float(p.get("z_start", 0.0))
            dz = float(p["z_step"])
        except (TypeError, ValueError):
            raise jobs_lib.JobError("z_start/z_step must be numbers")
        if dz == 0:
            raise jobs_lib.JobError("z_step must be nonzero")
        zs = z0 + dz * np.arange(stack.shape[0], dtype=np.float64)
    else:
        raise jobs_lib.JobError(
            "calibrate_astigmatism needs z_positions (list) or "
            "z_start + z_step"
        )
    try:
        calib, diag = psf.calibrate_astigmatism(
            stack, zs,
            window=int(p.get("window", 15)),
            min_distance=int(p.get("min_distance", 3)),
            iterations=int(p.get("iterations", 12)),
            diagnostics=True,
        )
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: calibration failed: {e}")

    # round-trip self-check: invert the measured widths through the
    # fitted curves; the residual quantifies defocus-model adherence
    z_hat = np.asarray(
        psf.z_from_widths(diag["sigma_x"], diag["sigma_y"], calib)
    )
    rmse = float(np.sqrt(np.mean((z_hat - diag["z"]) ** 2)))
    span = float(zs.max() - zs.min())

    out_path = os.path.join(job.output, "astig_calibration.json")
    tmp = out_path + ".tmp"
    calib.to_json(tmp)
    os.replace(tmp, out_path)
    metrics = {
        "n_planes": int(stack.shape[0]),
        "z_range": [float(zs.min()), float(zs.max())],
        "roundtrip_z_rmse": round(rmse, 4),
        "roundtrip_z_rmse_frac": round(rmse / max(span, 1e-12), 6),
    }
    return {"calibration": out_path, "metrics": json.dumps(metrics)}


if os.environ.get("SEQUITR_TEST_WEDGE"):  # pragma: no cover - subprocess only
    # test hook: a pipeline that never returns, for exercising the watchdog
    # -> worker-recycle path end-to-end from a real supervisor subprocess
    @register("__test_wedge__")
    def _test_wedge(job: Job, config: ServerConfiguration):
        time.sleep(3600)


if os.environ.get("SEQUITR_TEST_SLOW"):  # pragma: no cover - subprocess only
    # test hook for the multi-worker e2e: a job slow enough to SIGKILL its
    # owner mid-run. Writes the worker's pid so the test kills exactly that
    # process; the reclaimed RE-run sees the pid file already present and
    # finishes fast (the rescue, not the sleep, is what's under test).
    @register("__test_slow__")
    def _test_slow(job: Job, config: ServerConfiguration):
        out = job.output or "."
        os.makedirs(out, exist_ok=True)
        pid_file = os.path.join(out, "worker_pid.txt")
        rerun = os.path.exists(pid_file)
        with open(pid_file, "w") as f:
            f.write(str(os.getpid()))
        end = time.time() + (0.5 if rerun else float(job.params.get("sleep", 10.0)))
        while time.time() < end:
            # poll the cancel marker like every real pipeline does between
            # frames/steps, so lifecycle tests can cancel this job too
            if jobs_lib.cancel_requested(job):
                raise jobs_lib.JobCancelled(
                    f"job {job.id} cancelled mid-sleep"
                )
            time.sleep(0.2)
        return {"rerun": str(rerun)}


@register("deconvolve")
def deconvolve_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Richardson–Lucy deconvolution of a TIFF stack (PSF subsystem).

    Exposes ``psf.richardson_lucy`` through the job API — no model
    required. 2D mode deconvolves each frame of a (T, H, W) stack with a
    Gaussian PSF; ``dims: 3`` treats the input as one (Z, H, W) volume
    with an anisotropic 3D PSF. params: ``iterations`` (default 20),
    ``sigma`` (in-plane PSF sigma, px, default 1.5), ``psf_size`` (default
    9), and for 3D ``sigma_z``/``psf_size_z``. ``data_parallel`` (2D
    only): frames sharded over all chips of the mesh — per-frame RL
    deconvolution is embarrassingly parallel, each chip iterating
    against the replicated PSF with zero inter-chip traffic; output
    identical to streaming (dims=3 rejects the flag: a volume is one
    fused graph). Multi-channel (2D): one input entry per channel — each
    channel deconvolves independently with the shared PSF into
    ``deconvolved_c{k}.tif``. Frames stream with H2D
    overlap and page-append output (bounded memory, like every serving
    pipeline). Outputs: deconvolved.tif (float32).

    TIMELAPSES OF VOLUMES (dims=3): a directory/glob entry (one z-stack
    file per timepoint) or a single T·Z-page file with ``z``
    pages-per-volume deconvolves every timepoint through one cached
    graph — per-timepoint ``deconvolved_t{t:04d}.tif`` outputs,
    ``frame_range`` selects timepoints, streamed + cancellable (the same
    convention as segmentation_unet3d and register_stack).
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu import psf
    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.pipeline import infer as infer_lib

    paths = _resolve_inputs(job)
    path = paths[0]
    p = job.params
    iterations = int(p.get("iterations", 20))
    sigma = float(p.get("sigma", 1.5))
    psf_size = int(p.get("psf_size", 9))
    dims = int(p.get("dims", 2))
    if iterations < 1:
        raise jobs_lib.JobError(f"iterations must be >= 1, got {iterations}")

    from sequitr_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    t0 = time.time()
    out_path = os.path.join(job.output, "deconvolved.tif")
    dp_devices = 0
    if dims == 3 and p.get("roi") is not None:
        raise jobs_lib.JobError("roi deconvolution is 2D-only")
    if dims == 3 and len(paths) > 1:
        raise jobs_lib.JobError(
            "multi-channel deconvolution is 2D-only (one entry per "
            "channel); deconvolve dims=3 volumes one channel per job"
        )
    if dims == 3 and p.get("data_parallel"):
        raise jobs_lib.JobError(
            "data_parallel deconvolution is 2D-only (a dims=3 volume is "
            "one fused graph; timelapses stream per timepoint)"
        )
    if dims == 3:
        z_val = _parse_z_pages(job)
        if z_val is not None or _expand_inputs_entry(path) != [path]:
            return _deconvolve_volume_timelapse(job, path, z_val, timer, t0)
        if job.params.get("frame_range") is not None:
            raise jobs_lib.JobError(
                "frame_range applies to 2D frame streams or volume "
                "TIMELAPSES (directory/glob or z input), not a single "
                "dims=3 volume"
            )
        vol = _read_stack_or_fail(job, path)
        if vol.ndim != 3:
            raise jobs_lib.JobError(
                f"dims=3 expects one (Z, H, W) stack, got {vol.shape}"
            )
        kernel = psf.gaussian_psf_3d(
            psf_size, int(p.get("psf_size_z", 5)),
            sigma, float(p.get("sigma_z", sigma * 2.0)),
        )
        with timer.phase("infer"):
            out = jax.jit(
                lambda v: psf.richardson_lucy(v, kernel, iterations)
            )(vol)
        with timer.phase("fetch"):
            got = np.asarray(out, dtype=np.float32)
        # page-append with tmp/rename (and automatic BigTIFF for >4 GiB
        # volumes) — same output semantics as every other pipeline
        writer = _append_writer(
            out_path, float(got.nbytes), _out_compression(job)
        )
        try:
            with timer.phase("write"):
                for plane in got:
                    writer.append(plane)
        except BaseException:
            writer.abort()
            raise
        writer.close()
        n_frames = vol.shape[0]
    else:
        try:
            # one entry per CHANNEL (the uniform convention); each
            # channel deconvolves independently with the shared PSF
            source = FrameSource(paths=paths)
        except ValueError as e:
            raise jobs_lib.JobError(
                f"job {job.id}: cannot read inputs {paths}: {e}"
            )
        source = _apply_roi(job, _apply_frame_range(job, source))
        n_chan = source.n_channels
        kernel = psf.gaussian_psf_2d(psf_size, sigma)
        n_frames = len(source)
        use_dp = bool(p.get("data_parallel")) and jax.device_count() > 1
        comp = _out_compression(job)
        est = float(n_frames) * np.prod(source.spatial) * 4
        names = (
            ["deconvolved"]
            if n_chan == 1
            else [f"deconvolved_c{k}" for k in range(n_chan)]
        )
        writers = []  # created inside the abort guard: a failed k-th
        # open must not leak writers 0..k-1's fds and .tmp files

        def write_frame(got):
            """Append one deconvolved frame, one page per channel
            writer ((H, W) is just the single-channel view)."""
            chans = got[..., None] if got.ndim == 2 else got
            for k, (_n, _p, w) in enumerate(writers):
                w.append(np.ascontiguousarray(chans[..., k]))

        try:
            for name in names:
                pth = (
                    out_path
                    if name == "deconvolved"
                    else os.path.join(job.output, f"{name}.tif")
                )
                writers.append((name, pth, _append_writer(pth, est, comp)))
            with source:
                if use_dp:
                    # frames sharded over the mesh: per-frame RL
                    # deconvolution is embarrassingly parallel (zero
                    # inter-chip traffic), the same DP shape as
                    # first-mode registration
                    from sequitr_tpu import parallel

                    mesh = parallel.make_mesh()
                    n_dev = dp_devices = int(mesh.devices.size)
                    dp = parallel.make_dp_deconvolver(
                        mesh, kernel, iterations
                    )
                    for chunk, n_real in _dp_chunk_stream(
                        job, source.chunks(n_dev), n_frames, n_dev
                    ):
                        with timer.phase("infer"):
                            out = dp(
                                jnp.asarray(chunk, jnp.float32)
                            )
                        with timer.phase("fetch"):
                            got = np.asarray(out, np.float32)
                        with timer.phase("write"):
                            for k in range(n_real):
                                write_frame(got[k])
                else:
                    deconv = jax.jit(
                        lambda f: psf.richardson_lucy_frame(
                            f, kernel, iterations
                        )
                    )
                    for out in jobs_lib.track(
                        job,
                        infer_lib.stream_frames(
                            deconv,
                            _reads_fail_fast(job, source.frames()),
                            prefetch_host=infer_lib._copy_to_host_async,
                        ),
                        total=n_frames,
                    ):
                        with timer.phase("fetch"):
                            got = np.asarray(out, dtype=np.float32)
                        with timer.phase("write"):
                            write_frame(got)
        except BaseException:
            for _name, _pth, w in writers:
                w.abort()
            raise
        outputs = {}
        for name, pth, w in writers:
            w.close()
            outputs[name] = pth
    total_s = time.time() - t0
    metrics = dict(timer.summary(), total_s=round(total_s, 4), n_frames=n_frames)
    if dp_devices:
        metrics["n_devices"] = dp_devices
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    if dims == 3:
        outputs = {"deconvolved": out_path}
    outputs["metrics"] = json.dumps(metrics)
    return outputs


@register("correct_illumination")
def correct_illumination_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Retrospective illumination correction of a timelapse stack.

    No model required — exposes ``ops.illumination`` through the job
    API. Estimation pass: up to ``sample_frames`` evenly-spaced frames
    (random access, O(sample) reads) give a flat-field shading profile
    (per-pixel median + low-order polynomial fit — the same estimator
    mosaics use) and a photobleach model. Streaming pass: every frame
    runs through ONE fused jit graph (cast -> divide by shading ->
    per-frame median -> gain scale) with page-append float32 output,
    progress + cancellation like every serving pipeline.

    params: ``flatfield`` (default true), ``flatfield_order`` (total 2D
    polynomial degree, default 2), ``bleach`` ("exp" fits the
    log-median decay over the sampled frames and applies the inverse
    ramp — removes the monotone trend only; "ratio" rescales every
    frame by its OWN on-device median to the first frame's level —
    exact stationarity but erases real global dynamics; "none"),
    ``sample_frames`` (default 64, >= 2), plus the uniform
    ``frame_range`` / ``roi`` / ``compress_output``. Multi-channel: one
    input entry per channel, independent profile + bleach per channel.

    Calibrate-once / apply-many (the mosaic positions-reuse pattern):
    ``estimate_only: true`` writes shading.tif + gains.csv and skips
    the corrected stack; ``shading`` (a shading.tif path or a previous
    job's output dir, chains via ``depends_on``) applies that measured
    profile instead of re-estimating — so one blank/reference run can
    correct every subsequent acquisition round, and the profile a
    dedicated flat-field acquisition measures beats any retrospective
    estimate. Bleach is still per-run (each acquisition bleaches its
    own sample).

    Outputs: corrected.tif (float32; corrected_c{k}.tif per channel),
    shading.tif (one page per channel), gains.csv (per-frame applied
    gain + median per channel, absolute frame indices), metrics incl.
    per-channel ``bleach_rate`` (positive = decaying, per-frame log
    units). 2D-only: a volume has no single plane sharing one shading
    profile, so ``dims: 3`` is rejected loudly.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data import tiff
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import illumination as illum
    from sequitr_tpu.utils import PhaseTimer

    p = job.params
    if int(p.get("dims", 2)) != 2:
        raise jobs_lib.JobError(
            "correct_illumination is 2D-only: frames of a fixed-FoV "
            "timelapse share one shading profile; a volume does not"
        )
    mode = str(p.get("bleach", "exp"))
    if mode not in ("exp", "ratio", "none"):
        raise jobs_lib.JobError(
            f"bleach must be 'exp', 'ratio' or 'none', got {mode!r}"
        )
    use_ff = bool(p.get("flatfield", True))
    order = int(p.get("flatfield_order", 2))
    if not 1 <= order <= 6:
        raise jobs_lib.JobError(
            f"flatfield_order={order} must be in [1, 6]"
        )
    sample = int(p.get("sample_frames", 64))
    if sample < 2:
        raise jobs_lib.JobError(
            f"sample_frames must be >= 2, got {sample}"
        )
    estimate_only = bool(p.get("estimate_only", False))
    shading_src = p.get("shading")
    if shading_src is not None and not use_ff:
        raise jobs_lib.JobError(
            "shading provided but flatfield: false — a supplied profile "
            "IS the flat-field correction; drop one of the two"
        )

    paths = _resolve_inputs(job)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(
            f"job {job.id}: cannot read inputs {paths}: {e}"
        )
    source = _apply_roi(job, _apply_frame_range(job, source))
    n = len(source)
    if n < 1:
        raise jobs_lib.JobError("empty input stack")
    n_chan = source.n_channels
    h, w = source.spatial

    timer = PhaseTimer()
    t0 = time.time()
    from sequitr_tpu.pipeline import infer as infer_lib

    with source:
        # -- estimation pass (host, sampled) --------------------------
        # sampling is gated on what the job actually needs: the profile
        # and/or the exp fit want a spread of frames; ratio wants only
        # frame 0's median; flat-field-off + bleach-none reads nothing
        with timer.phase("estimate"):
            shading = np.ones((h, w, n_chan), np.float32)
            ref_med = np.ones(n_chan, np.float32)
            rates = np.zeros(n_chan, np.float64)
            gains_all = np.ones((n, n_chan), np.float32)
            idx = np.zeros(0, int)
            if shading_src is not None:
                # reuse a measured/previously-estimated profile: a path
                # to shading.tif, or a previous job's output dir (chains
                # via depends_on) — calibrate once, apply every round
                sp = str(shading_src)
                if os.path.isdir(sp):
                    sp = os.path.join(sp, "shading.tif")
                try:
                    prof = np.asarray(tiff.read_stack(sp), np.float32)
                except (OSError, ValueError) as e:
                    raise jobs_lib.JobError(
                        f"cannot read shading profile {sp}: {e}"
                    )
                if prof.ndim == 2:
                    prof = prof[None]
                if prof.shape != (n_chan, h, w):
                    raise jobs_lib.JobError(
                        f"shading profile {sp} is {prof.shape}, input "
                        f"needs ({n_chan}, {h}, {w}) (channels, H, W)"
                    )
                if not np.isfinite(prof).all() or prof.min() <= 0:
                    raise jobs_lib.JobError(
                        f"shading profile {sp} must be finite and > 0"
                    )
                shading = np.ascontiguousarray(
                    np.moveaxis(prof, 0, -1)
                )
            estimate_ff = use_ff and shading_src is None
            if estimate_ff or mode == "exp":
                idx = np.unique(
                    np.linspace(0, n - 1, min(sample, n)).round().astype(int)
                )
                sampled = np.stack(
                    [np.atleast_3d(source.frame(int(t))) for t in idx]
                ).astype(np.float32)  # (S, H, W, C)
                if estimate_ff:
                    for c in range(n_chan):
                        shading[:, :, c] = illum.fit_shading(
                            sampled[..., c], order=order
                        )
                corr = sampled / shading[None]
                meds = np.median(corr, axis=(1, 2))  # (S, C)
                ref_med = meds[0].astype(np.float32)  # idx includes 0
                if mode == "exp":
                    for c in range(n_chan):
                        gains_all[:, c], rates[c] = (
                            illum.estimate_bleach_exp(idx, meds[:, c], n)
                        )
            elif mode == "ratio":
                f0 = np.atleast_3d(source.frame(0)).astype(np.float32)
                f0 = f0 / shading
                ref_med = np.median(f0, axis=(0, 1)).astype(np.float32)
                idx = np.zeros(1, int)
            if mode == "ratio":
                # the corrector falls back to gain 1 on a blank
                # reference — surface that it happened, per channel
                for c in np.nonzero(ref_med <= 1e-6)[0]:
                    job.runtime_warnings.append(
                        f"ratio reference (first served frame, channel "
                        f"{c}) is blank; no bleach gain applied to that "
                        "channel"
                    )

        outputs = {}
        if estimate_only:
            # calibration-only run: write the profile + planned gains
            # (medians known only at the sampled frames); a later apply
            # job reuses them via `shading` / depends_on
            med_at = (
                {int(t): meds[s] for s, t in enumerate(idx)}
                if len(idx) and mode == "exp" else {}
            )
            nan_med = np.full(n_chan, np.nan)
            gain_rows = [
                (t + source.frame_offset, gains_all[t].astype(np.float64),
                 med_at.get(t, nan_med))
                for t in range(n)
            ]
        else:
            # -- streaming pass (device): dispatch runs `prefetch`
            # frames ahead while a reader thread overlaps disk ingest
            # with compute and D2H starts right after each dispatch —
            # the same stream_frames shape as deconvolve/serving
            run = illum.make_corrector(mode)
            shading_dev = jnp.asarray(shading)
            gains_dev = jnp.asarray(gains_all)
            ref_dev = jnp.asarray(ref_med)
            t_iter = iter(range(n))

            def dev_fn(frame):
                # stream_frames launches strictly in frame order, so the
                # per-frame gain row rides a closed-over index iterator
                return run(
                    frame, shading_dev, gains_dev[next(t_iter)], ref_dev
                )

            est = float(n) * h * w * 4
            comp = _out_compression(job)
            names = (
                ["corrected"]
                if n_chan == 1
                else [f"corrected_c{k}" for k in range(n_chan)]
            )
            writers = []
            gain_rows = []
            try:
                for name in names:
                    pth = os.path.join(job.output, f"{name}.tif")
                    writers.append(
                        (name, pth, _append_writer(pth, est, comp))
                    )
                frames3 = _reads_fail_fast(
                    job, (np.atleast_3d(f) for f in source.frames())
                )
                for t, (out, med, g) in enumerate(
                    jobs_lib.track(
                        job,
                        infer_lib.stream_frames(
                            dev_fn, frames3,
                            # all three outputs are fetched: D2H each
                            prefetch_host=lambda out: [
                                infer_lib._copy_to_host_async(a)
                                for a in out
                            ],
                        ),
                        total=n,
                    )
                ):
                    with timer.phase("fetch"):
                        got = np.asarray(out, np.float32)
                        gain_rows.append(
                            (t + source.frame_offset,
                             np.asarray(g, np.float64),
                             np.asarray(med, np.float64))
                        )
                    with timer.phase("write"):
                        for k, (_n, _p, wtr) in enumerate(writers):
                            wtr.append(np.ascontiguousarray(got[..., k]))
            except BaseException:
                for _name, _pth, wtr in writers:
                    wtr.abort()
                raise
            for name, pth, wtr in writers:
                wtr.close()
                outputs[name] = pth

    shading_path = os.path.join(job.output, "shading.tif")
    tiff.write_stack(
        shading_path, np.ascontiguousarray(np.moveaxis(shading, -1, 0))
    )
    outputs["shading"] = shading_path
    gains_path = os.path.join(job.output, "gains.csv")
    hdr = (
        "frame,"
        + ",".join(f"gain_c{k}" for k in range(n_chan))
        + ","
        + ",".join(f"median_c{k}" for k in range(n_chan))
    )
    tmp = gains_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(hdr + "\n")
        for t_abs, g, med in gain_rows:
            f.write(
                f"{t_abs},"
                + ",".join(f"{v:.6f}" for v in g)
                + ","
                + ",".join(f"{v:.6f}" for v in med)
                + "\n"
            )
    os.replace(tmp, gains_path)
    outputs["gains"] = gains_path

    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), total_s=round(total_s, 4), n_frames=n,
        sample_frames=int(len(idx)), bleach=mode,
        flatfield=bool(use_ff),
        shading_min=round(float(shading.min()), 4),
        shading_max=round(float(shading.max()), 4),
    )
    for c in range(n_chan):
        metrics[f"bleach_rate_c{c}"] = round(float(rates[c]), 6)
    if total_s > 0:
        metrics["frames_per_sec"] = round(n / total_s, 3)
    outputs["metrics"] = json.dumps(metrics)
    return outputs


def _deconvolve_volume_timelapse(
    job: Job, path: str, z: Optional[int], timer, t0: float
) -> Dict[str, str]:
    """Timelapse body of ``deconvolve`` dims=3: one jitted
    Richardson-Lucy graph reused across every (Z, H, W) timepoint of a
    volume sequence; per-timepoint ``deconvolved_t{t:04d}.tif`` outputs.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu import psf
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.pipeline import infer as infer_lib

    p = job.params
    iterations = int(p.get("iterations", 20))
    sigma = float(p.get("sigma", 1.5))
    psf_size = int(p.get("psf_size", 9))
    try:
        seq = VolumeSequence(path, z=z)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    seq = _apply_frame_range(job, seq)
    kernel = psf.gaussian_psf_3d(
        psf_size, int(p.get("psf_size_z", 5)),
        sigma, float(p.get("sigma_z", sigma * 2.0)),
    )
    fn = jax.jit(
        lambda v: psf.richardson_lucy(
            v.astype(jnp.float32), kernel, iterations
        )
    )
    comp = _out_compression(job)
    n_t = len(seq)
    vol_bytes = float(np.prod(seq.spatial)) * 4
    try:
        # read-ahead: volume t+1's decode overlaps volume t's compute,
        # matching every other serving loop (read errors -> JobError)
        vol_iter = jobs_lib.track(
            job, infer_lib._iter_read_ahead(seq.volumes(), 2),
            total=n_t, phase="volumes",
        )
        for t, vol in _reads_fail_fast(job, enumerate(vol_iter)):
            with timer.phase("infer"):
                out = fn(vol)
            with timer.phase("fetch"):
                got = np.asarray(out, dtype=np.float32)
            t_abs = seq.frame_offset + t
            writer = _append_writer(
                os.path.join(job.output, f"deconvolved_t{t_abs:04d}.tif"),
                vol_bytes, comp,
            )
            try:
                with timer.phase("write"):
                    for plane in got:
                        writer.append(plane)
            except BaseException:
                writer.abort()
                raise
            writer.close()
    finally:
        seq.close()
    total_s = time.time() - t0
    metrics = dict(
        timer.summary(), total_s=round(total_s, 4), n_volumes=n_t,
        volumes_per_sec=round(n_t / max(total_s, 1e-9), 3),
    )
    return {"deconvolved": job.output, "metrics": json.dumps(metrics)}
