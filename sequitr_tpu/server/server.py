"""The image server: watched-dir loop, pipeline registry, built-in pipelines.

Rebuilds sequitr's long-lived GPU image server (SURVEY.md §3.1) on the TPU
stack: a single-process loop scans the jobs directory, atomically claims
each job, dispatches to the registered pipeline and writes results plus a
status marker into the job's output directory. Client and server still
communicate only via the filesystem — the reference's public contract.

Built-in pipelines (registry keys are the rebuild's documented API):
  * ``segmentation_unet2d`` / ``segmentation_unet3d`` — tiled sliding-window
    segmentation of a TIFF stack (options: data_parallel, spatial_parallel
    — true = all chips per frame, int S = S-way spatial x n/S-way data
    hybrid — save_probs, localize); writes label-map TIFF, probability
    TIFF and btrack HDF5 localizations.
  * ``enhancement_gan`` — pix2pix generator pass over a TIFF stack.
  * ``build_records`` / ``build_gan_pairs`` — training-shard builders
    (normalization + U-Net weight maps at record-creation time; 2D frames
    or 3D volumes, optional random patch crops).
  * ``train_unet2d`` / ``train_unet3d`` / ``train_gan`` — training jobs
    that register the resulting model under ``models_dir`` (resume from
    the newest checkpoint; JSONL metrics + holdout eval + keep_best).
  * ``evaluate_unet2d`` / ``evaluate_unet3d`` / ``evaluate_gan`` — score a
    registered model against ground truth (per-class IoU/dice, mIoU and
    pixel/voxel accuracy for segmentation; L1/PSNR for enhancement).
  * ``localize_emitters`` — single-molecule sub-pixel localization over a
    stack (PSF subsystem; no model required). ``dims: 3`` localizes in
    volume timelapses; ``astigmatism`` infers z from per-axis widths via
    a cylindrical-lens calibration.
  * ``calibrate_astigmatism`` — fit the width-vs-z calibration from a
    bead z-scan (chains into ``localize_emitters`` via ``depends_on``).
  * ``deconvolve`` — Richardson-Lucy deconvolution (2D per-frame streamed
    or a 3D volume; Gaussian PSF; no model required).
  * ``parity_check`` — validate a registered model against an independent
    re-derivation (torch/keras) on identical weights.
  * ``finetune_spatial`` — giant-frame training: halo-exchange spatial
    (or hybrid DPxspatial) sharding of the train step across the mesh.
  * ``track_objects`` — frame linking over a serve's objects.h5
    (gated-Hungarian; optional Kalman motion model + binary-fission
    lineage; btrack remains the Bayesian publication-grade path).
  * ``count_spots`` — assign a ``localize_emitters`` run's spots to a
    segmentation's objects (spots-per-cell; FISH-style quantification).
  * ``qc_stack`` — per-frame acquisition QC (focus/exposure/saturation
    scored on device, run-relative outlier flags) before chip time is
    spent.
  * ``project_stack`` — z-projection of volume timelapses (max/mean/...,
    best-focus plane pick, per-pixel EDoF with height map) — the bridge
    from volumetric acquisitions into every 2D pipeline.
  * ``export_ctc`` — render a tracking run as Cell-Tracking-Challenge
    masks + res_track.txt (labels repainted to track labels).
  * ``measure_tracks`` — join a tracking run onto per-object
    measurements: per-track multi-channel intensity traces.
  * ``register_stack`` — drift correction: FFT phase-correlation
    registration of a timelapse (sub-pixel, streamed; no model required).
  * ``stitch_mosaic`` — grid-of-tiles composite (seam phase correlation,
    global position solve, feathered blend; flat-field + gain matching).
  * ``correct_illumination`` — retrospective flat-field + photobleach
    compensation of a timelapse (sampled estimation, streamed apply).

Jobs chain through the same filesystem contract: a spec's optional
``depends_on`` lists output DIRECTORIES the job waits on — it stays queued
until each holds a complete ``status.json``, fails deterministically if a
dependency fails/cancels (cascading down chains), and ``dep_timeout``
bounds the wait (jobs.check_dependencies). Submit a whole
register -> segment -> track workflow up front; no client-side polling.

Model weights are orbax checkpoints under ``models_dir/<name>``, saved with
matching config JSON (``config.json``) so the server can rebuild the net.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
import traceback
from typing import Callable, Dict, Optional

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.jobs import Job

log = logging.getLogger("sequitr_tpu.server")

__all__ = ["PipelineRegistry", "ImageServer", "REGISTRY", "register", "JobTimeout"]


class JobTimeout(RuntimeError):
    """A job exceeded the server's per-job wall-clock budget."""


# process exit code for a deliberate post-timeout worker recycle; the
# supervisor restarts these without charging the crash-restart budget
EXIT_RECYCLE = 43


class PipelineRegistry:
    """(module, func) -> pipeline callable(job, config) registry.

    Jobs name a module plus an optional sub-operation ``func`` (SURVEY.md §1
    L6 job schema: "module, function/pipeline"). Pipelines register under a
    module name with ``func="run"`` by default; a module may register
    several funcs (e.g. aliases for API compatibility). Unknown module or
    func is a deterministic JobError listing what exists.
    """

    def __init__(self):
        self._pipelines: Dict[str, Dict[str, Callable]] = {}

    def register(self, name: str, func: str = "run"):
        def deco(fn):
            self._pipelines.setdefault(name, {})[func] = fn
            return fn

        return deco

    def get(self, name: str, func: str = "run") -> Callable:
        if name not in self._pipelines:
            raise jobs_lib.JobError(
                f"unknown pipeline {name!r}; available: {sorted(self._pipelines)}"
            )
        funcs = self._pipelines[name]
        if func not in funcs:
            raise jobs_lib.JobError(
                f"pipeline {name!r} has no func {func!r}; available: {sorted(funcs)}"
            )
        return funcs[func]

    def names(self):
        return sorted(self._pipelines)


REGISTRY = PipelineRegistry()
register = REGISTRY.register


class ImageServer:
    """Long-lived job server (SURVEY.md §3.1 rebuild)."""

    def __init__(self, config: ServerConfiguration, registry: PipelineRegistry = REGISTRY):
        self.config = config
        self.registry = registry
        config.ensure_dirs()
        if config.compilation_cache_dir:
            # a restarted server must not pay minutes of recompilation for
            # graphs it has served before (SURVEY.md §5 failure recovery)
            import jax

            try:
                path = os.path.expanduser(config.compilation_cache_dir)
                os.makedirs(path, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", path)
            except Exception:
                # never refuse to start over the (optional) cache — e.g. a
                # read-only HOME, a file squatting the path, or config drift
                log.warning(
                    "could not enable the XLA compilation cache", exc_info=True
                )

    def run_forever(self, early_drain=None) -> None:  # pragma: no cover - interactive loop
        """Poll loop with graceful drain.

        SIGUSR1 = drain: finish the job currently running (jobs are only
        checked BETWEEN polls, so nothing is interrupted), then exit 0
        leaving the queue untouched — the rolling-restart signal. SIGTERM/
        SIGINT keep their abrupt semantics (the stale-claim reclaimer
        rescues an interrupted job, but it re-runs from scratch).

        ``early_drain``: optional ``{"drain": bool}`` dict populated by a
        boot-time handler (the CLI installs one before the slow jax init)
        so a signal that arrived while the process was still starting is
        not lost — it is consumed here, after this loop's own handler is
        installed.
        """
        import signal

        def _drain(signum, frame):
            self._draining = True
            log.info("drain requested: finishing the current job, then exiting")

        self._draining = False
        try:
            signal.signal(signal.SIGUSR1, _drain)
        except (ValueError, OSError, AttributeError):
            pass  # non-main thread or platform without SIGUSR1
        if early_drain and early_drain.get("drain"):
            self._draining = True
        log.info("server watching %s (pipelines: %s)", self.config.jobs_dir, self.registry.names())
        # a drain arriving while idle exits WITHOUT claiming another job:
        # the idle sleep runs in short chunks (PEP 475 would otherwise
        # RESUME a long sleep after the handler, delaying the exit by up
        # to poll_interval), poll_once itself re-checks the flag before
        # every claim, and the post-poll check covers a drain that
        # arrived mid-job
        while not self._draining:
            ran = self.poll_once()
            if self._draining:
                break
            if not ran:
                deadline = time.monotonic() + self.config.poll_interval
                while not self._draining:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    time.sleep(min(left, 0.2))
        log.info("drained: exiting cleanly")

    def poll_once(self) -> bool:
        """Claim and run at most one queued job. Returns True if one ran.

        A job file that cannot be parsed (invalid JSON, missing ``module``)
        is quarantined as ``<name>.rejected`` instead of crashing the loop —
        a malformed client submission must never take the server down.
        """
        if self.config.stale_claim_timeout:
            # rescue jobs orphaned by a hard-killed worker before scanning,
            # so a reclaimed job is claimable in this same tick
            jobs_lib.reclaim_stale_claims(
                self.config.jobs_dir, self.config.stale_claim_timeout
            )
        for path in jobs_lib.scan_jobs(self.config.jobs_dir):
            if getattr(self, "_draining", False):
                # a drain that lands during the reclaim/scan phase (which
                # can be long on a large jobs dir) must not claim one more
                # job — "finish the job currently running" means exactly
                # the one already claimed
                return False
            # dependency gate BEFORE claiming: a waiting job stays queued
            # untouched (cancellable, visible to stats) instead of
            # claim/requeue churn; the claim race below stays the only
            # arbiter when several workers see the same verdict
            dep_state, dep_detail = jobs_lib.check_dependencies(path)
            if dep_state == "wait":
                continue
            try:
                job = jobs_lib.claim_job(path)
            except (jobs_lib.JobError, ValueError) as e:
                claimed = path[: -len(jobs_lib.JOB_SUFFIX)] + jobs_lib.CLAIMED_SUFFIX
                rejected = path + ".rejected"
                for cand in (claimed, path):
                    if os.path.exists(cand):
                        os.replace(cand, rejected)
                        break
                log.error("rejected malformed job %s: %s", path, e)
                continue
            if job is None:
                continue
            if dep_state == "fail":
                # deterministic: a failed/cancelled/timed-out dependency
                # cannot heal by retrying. Same terminal artifacts as any
                # failure (status.json, .failed marker, ledger row) so the
                # cascade is observable; keep scanning — another queued
                # job may be runnable this tick.
                # no pipeline runs: _fail's status write creates the
                # output dir itself and nothing reads job.params here
                started = time.time()
                self._fail(job, started, f"job {job.id}: {dep_detail}")
                self._ledger(job, "failed", started, 0)
                continue
            self._execute(job)
            return True
        return False

    def _execute(self, job: Job) -> None:
        started = time.time()
        # track which params the pipeline actually reads so misspelled
        # ones ("lerning_rate") surface as warnings instead of silently
        # running with defaults
        job.params = jobs_lib.ParamTracker(job.params)
        os.makedirs(job.output or ".", exist_ok=True)
        # a previous run into the same output dir (the documented
        # resume-by-resubmitting flow) leaves its last progress.json behind;
        # without this the status CLI would report the dead run's counters
        # as THIS run's live progress until the first rate-limited update
        try:
            os.unlink(
                os.path.join(
                    job.output or os.path.dirname(job.path), "progress.json"
                )
            )
        except OSError:
            pass
        jobs_lib.write_status(job, "running", started)
        attempts = 0
        while True:
            attempts += 1
            try:
                pipeline = self.registry.get(job.module, job.func)
                if job.params.get("profile"):
                    pipeline = _profiled(pipeline)
                outputs = self._run_with_watchdog(pipeline, job) or {}
                unread = job.params.unread_keys()
                warnings = list(job.runtime_warnings) or None
                if unread:
                    warnings = (warnings or []) + [
                        f"unknown param {k!r}: never read by "
                        f"{job.module!r} (misspelled?)" for k in unread
                    ]
                    log.warning(
                        "job %s: params never read by %s: %s",
                        job.id, job.module, ", ".join(unread),
                    )
                jobs_lib.write_status(
                    job, "complete", started, outputs=outputs,
                    warnings=warnings,
                )
                if jobs_lib.owns_claim(job):
                    try:
                        os.unlink(job.path)
                    except OSError:
                        pass
                    # late marker must not leak to a reused id
                    jobs_lib.clear_cancel(job)
                else:
                    # a reclaimer decided we were dead (heartbeat starved
                    # longer than stale_claim_timeout) and re-queued the job
                    # while we finished it; another worker may hold a LIVE
                    # claim on the same path now — leave the claim file and
                    # the cancel marker alone (they are theirs, not ours).
                    # At-least-once semantics: the re-run overwrites the
                    # same outputs atomically. The success must NOT be
                    # turned into a failure over this.
                    log.warning(
                        "job %s finished but its claim was reclaimed "
                        "(heartbeat starved?); the job may run again", job.id,
                    )
                log.info("job %s complete in %.2fs", job.id, time.time() - started)
                self._ledger(job, "complete", started, attempts)
                return
            except jobs_lib.JobCancelled as e:
                # a cooperative stop, not a failure: terminal `cancelled`
                # state, queue file removed, no retry, no worker recycle —
                # the chip stays warm for the next job (round-4 item 4)
                jobs_lib.write_status(job, "cancelled", started, error=str(e))
                if jobs_lib.owns_claim(job):
                    try:
                        os.unlink(job.path)
                    except OSError:
                        pass
                    jobs_lib.clear_cancel(job)
                log.info("job %s cancelled in %.2fs", job.id, time.time() - started)
                self._ledger(job, "cancelled", started, attempts)
                return
            except Exception as e:
                err = traceback.format_exc()
                # deterministic failures (bad module/func/params/inputs) and
                # watchdog timeouts never retry: re-running cannot succeed
                final = (
                    attempts > self.config.max_retries
                    or isinstance(e, (jobs_lib.JobError, JobTimeout))
                )
                if final:
                    self._fail(job, started, err)
                    self._ledger(job, "failed", started, attempts)
                    if isinstance(e, JobTimeout) and self._recycle_on_timeout():
                        # the wedged thread still owns the chip; a worker
                        # under a supervisor frees it by dying and letting
                        # the supervisor respawn a clean process. Failure
                        # marker + status are already on disk (atomic
                        # renames), so os._exit's abruptness loses nothing.
                        log.error(
                            "job %s timed out; recycling worker (exit %d)",
                            job.id, EXIT_RECYCLE,
                        )
                        os._exit(EXIT_RECYCLE)
                    return
                log.warning("job %s attempt %d failed, retrying", job.id, attempts)
                time.sleep(self.config.retry_backoff * attempts)

    def _ledger(self, job: Job, state: str, started: float, attempts: int) -> None:
        """Append one JSONL row per finished job to ``log_dir/jobs.jsonl``.

        The server-wide operational record (which jobs ran, how long, how
        many attempts) that per-job status.json files cannot give without
        crawling every output dir. Enabled by setting ``log_dir``; single
        O_APPEND line writes need no locking across workers."""
        if not self.config.log_dir:
            return
        row = {
            "id": job.id,
            "module": job.module,
            "func": job.func,
            "state": state,
            "elapsed_s": round(time.time() - started, 3),
            "attempts": attempts,
            "finished": time.time(),
            "worker": os.environ.get("SEQUITR_WORKER_ID"),
        }
        try:
            with open(
                os.path.join(self.config.log_dir, "jobs.jsonl"), "a"
            ) as f:
                f.write(json.dumps(row) + "\n")
        except OSError:
            log.warning("could not append to the jobs ledger", exc_info=True)

    def _recycle_on_timeout(self) -> bool:
        cfg = self.config.recycle_on_timeout
        if cfg is not None:
            return bool(cfg)
        # auto: recycle exactly when a supervisor exists to respawn us
        return os.environ.get("SEQUITR_WORKER_ID") is not None

    def _fail(self, job: Job, started: float, err: str) -> None:
        jobs_lib.write_status(job, "failed", started, error=err)
        if jobs_lib.owns_claim(job):
            jobs_lib.clear_cancel(job)
            # keep the claimed file as an inspectable .failed marker rather
            # than leaving .running litter in the queue dir
            try:
                os.replace(job.path, job.path + ".failed")
            except OSError:
                pass
        log.error("job %s failed:\n%s", job.id, err)

    def _run_with_watchdog(self, pipeline, job: Job):
        """Run the pipeline, bounded by ``config.job_timeout`` wall seconds.

        The pipeline runs on a daemon worker thread while the server thread
        supervises it: every few seconds it heartbeats the claimed file's
        mtime (the liveness signal ``stale_claim_timeout`` reclaim keys on)
        and, when a ``job_timeout`` is set, enforces it. On timeout the
        server raises JobTimeout and moves on to the next job. The abandoned
        thread cannot be force-killed in-process (a wedged jit compile keeps
        its core), but the queue no longer blocks forever behind it — the
        failure mode the reference's single-threaded loop had."""
        timeout = self.config.job_timeout
        import threading

        result: list = []
        error: list = []

        def work():
            try:
                result.append(pipeline(job, self.config))
            except BaseException as e:  # propagated below
                error.append(e)

        t = threading.Thread(target=work, daemon=True, name=f"job-{job.id}")
        t.start()
        # heartbeat well inside the reclaim window (default 5 s vs 300 s);
        # tests with tiny stale_claim_timeouts get a proportional beat
        hb = 5.0
        if self.config.stale_claim_timeout:
            hb = min(hb, self.config.stale_claim_timeout / 6.0)
        deadline = time.monotonic() + timeout if timeout else None
        while True:
            wait = hb
            if deadline is not None:
                # never oversleep the deadline: a sub-second job_timeout
                # must fire on time, not at the next heartbeat tick
                wait = min(hb, max(deadline - time.monotonic(), 0.0))
            t.join(wait)
            if not t.is_alive():
                break
            jobs_lib.heartbeat(job)
            if deadline is not None and time.monotonic() >= deadline:
                raise JobTimeout(
                    f"job {job.id} exceeded job_timeout={timeout}s; "
                    "abandoning worker thread and failing the job"
                )
        if error:
            raise error[0]
        return result[0]


def _profiled(pipeline):
    """Wrap a pipeline in a jax profiler trace (job param ``profile: true``).

    The XProf/Perfetto trace lands in ``<job output>/profile`` and the path
    is added to the job outputs — the rebuild's answer to the reference's
    TensorBoard profiling, but per job and on demand (SURVEY.md §5
    'Tracing/profiling')."""

    def run(job, config):
        from sequitr_tpu import utils

        pdir = os.path.join(job.output or ".", "profile")
        with utils.trace(pdir):
            outputs = pipeline(job, config) or {}
        outputs.setdefault("profile", pdir)
        return outputs

    return run


# ---------------------------------------------------------------------------
# model loading
# ---------------------------------------------------------------------------


def save_model(models_dir: str, name: str, kind: str, cfg, params, state) -> str:
    """Persist a model (config JSON + orbax checkpoint) for server use."""
    from sequitr_tpu.pipeline import train as train_lib

    model_dir = os.path.join(models_dir, name)
    os.makedirs(model_dir, exist_ok=True)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["__kind__"] = kind
    cfg_dict["compute_dtype"] = str(np.dtype(cfg.compute_dtype).name)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2)
    train_lib.save_checkpoint(
        os.path.join(model_dir, "ckpt"), {"params": params, "state": state}
    )
    return model_dir


def load_model(models_dir: str, name: str):
    """Load (kind, cfg, params, state) saved by ``save_model``."""
    import jax.numpy as jnp

    from sequitr_tpu.models import gan as gan_lib
    from sequitr_tpu.models import unet
    from sequitr_tpu.pipeline import train as train_lib

    model_dir = os.path.join(models_dir, name)
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    kind = cfg_dict.pop("__kind__")
    cfg_dict["compute_dtype"] = jnp.dtype(cfg_dict["compute_dtype"])
    # "n2v" models are UNetConfigs with a regression head (the kind keeps
    # a denoiser from being served through the softmax segmentation path)
    # "flows" models are UNetConfigs with a dims+1-channel regression head
    # (FLOW_SCALE x unit flows + cell-prob logit; served by segment_flows)
    # "stars" models are UNetConfigs with a 1+n_rays-channel regression
    # head (prob logit + per-ray distances; served by segment_stars)
    cfg_cls = {
        "unet": unet.UNetConfig,
        "gan": gan_lib.GANConfig,
        "n2v": unet.UNetConfig,
        "flows": unet.UNetConfig,
        "stars": unet.UNetConfig,
    }[kind]
    # forward compatibility: a model saved by a newer version may carry
    # config fields this version doesn't know. New fields default on save,
    # so dropping them (with a warning) beats refusing to load the model.
    known = {f.name for f in dataclasses.fields(cfg_cls)}
    unknown = sorted(set(cfg_dict) - known)
    if unknown:
        log.warning(
            "model %s: ignoring unknown config fields %s "
            "(saved by a newer version?)", name, unknown
        )
        cfg_dict = {k: v for k, v in cfg_dict.items() if k in known}
    cfg = cfg_cls(**cfg_dict)
    # orbax needs a concrete restore template (structure + shardings):
    # rebuild one from the config — init is cheap relative to inference
    import jax

    init_fn = {
        "unet": unet.init, "gan": gan_lib.init,
        "n2v": unet.init, "flows": unet.init, "stars": unet.init,
    }[kind]
    t_params, t_state = init_fn(jax.random.PRNGKey(0), cfg)
    restored = train_lib.restore_checkpoint(
        os.path.join(model_dir, "ckpt"), {"params": t_params, "state": t_state}
    )
    return kind, cfg, restored["params"], restored["state"]


# ---------------------------------------------------------------------------
# built-in pipelines
# ---------------------------------------------------------------------------


def _reject_low_confidence(resp, min_response: float, stats: dict) -> bool:
    """The registration confidence gate, shared by the serial-2D, DP and
    volumetric estimators so the hold policy cannot drift apart: True =
    reject this estimate (counted in ``stats``) — the caller yields the
    held trajectory and skips the anchor update."""
    if min_response and float(resp) < min_response:
        stats["n"] += 1
        return True
    return False


def _expand_inputs_entry(path: str):
    """Ordered file list for one input entry (dir/glob expansion) — [path]
    for a plain file; never raises (callers decide what emptiness means)."""
    from sequitr_tpu.data.source import _expand_channel

    try:
        return _expand_channel(path)
    except ValueError:
        return [path]


def _resolve_inputs(job: Job):
    import glob as glob_lib

    if not job.input:
        raise jobs_lib.JobError(f"job {job.id}: no input paths")
    for p in job.input:
        if os.path.exists(p):
            continue
        # the documented glob convention (FrameSource/VolumeSequence
        # expand entries like data/t_*.tif in natural order): a pattern
        # that matches at least one file is a valid entry
        if any(ch in p for ch in "*?[") and glob_lib.glob(p):
            continue
        raise jobs_lib.JobError(f"job {job.id}: input not found: {p}")
    return job.input


def _parse_z_pages(job: Job):
    """The ``z`` (pages-per-volume) param as int or None; bad values are
    deterministic — fail fast (shared by every volume-timelapse pipeline)."""
    z_param = job.params.get("z")
    try:
        return None if z_param is None else int(z_param)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"z={z_param!r} must be an integer (pages per volume)"
        )


def _robust_threshold(arr: np.ndarray, thr_abs, k_sig: float) -> float:
    """Absolute threshold if given, else robust per-frame median + k*MAD."""
    if thr_abs is not None:
        return float(thr_abs)
    med = float(np.median(arr))
    mad = float(np.median(np.abs(arr - med))) * 1.4826
    return med + k_sig * max(mad, 1e-12)


def _read_stack_or_fail(job: Job, path: str, dtype=np.float32) -> np.ndarray:
    """Read a TIFF stack; unreadable input is deterministic — fail fast."""
    from sequitr_tpu.data import tiff

    try:
        arr = tiff.read_stack(path)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read {path}: {e}")
    return np.asarray(arr, dtype=dtype) if dtype is not None else np.asarray(arr)


# (stamp, loaded) per model dir. A warm server re-loading the same model
# every job pays ~50 MB of transient tensorstore buffers and ~0.5 s of
# orbax restore per job; weights are immutable jax arrays, so sharing one
# loaded copy across jobs is safe. Invalidation: config.json + ckpt mtimes
# (save_model rewrites both when a model is re-registered).
_MODEL_CACHE: Dict[str, tuple] = {}
_MODEL_CACHE_MAX = 8


def _model_stamp(model_dir: str):
    try:
        cfg_ns = os.stat(os.path.join(model_dir, "config.json")).st_mtime_ns
        ckpt_ns = os.stat(os.path.join(model_dir, "ckpt")).st_mtime_ns
    except OSError:
        return None
    return (cfg_ns, ckpt_ns)


def load_model_cached(models_dir: str, name: str):
    """``load_model`` with a cross-job cache (stale entries re-load)."""
    model_dir = os.path.abspath(os.path.join(models_dir, name))
    stamp = _model_stamp(model_dir)
    entry = _MODEL_CACHE.get(model_dir)
    if entry is not None and stamp is not None and entry[0] == stamp:
        return entry[1]
    loaded = load_model(models_dir, name)
    if stamp is not None:
        if len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
            _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
        _MODEL_CACHE[model_dir] = (stamp, loaded)
    return loaded


def _require_model(job: Job, config: ServerConfiguration, expect_kind=None):
    """Load the job's model, raising deterministic JobErrors (never retried)
    for a missing param, an unregistered name, or the wrong model kind.
    ``expect_kind=None`` accepts any kind and returns it as the first
    element (kind-dispatching pipelines like parity_check)."""
    name = job.params.get("model")
    if not name:
        raise jobs_lib.JobError(f"job {job.id}: missing required param 'model'")
    try:
        kind, cfg, params, state = load_model_cached(config.models_dir, name)
    except (FileNotFoundError, KeyError) as e:
        raise jobs_lib.JobError(f"job {job.id}: model {name!r} not loadable: {e!r}")
    if expect_kind is None:
        return kind, cfg, params, state
    if kind != expect_kind:
        raise jobs_lib.JobError(
            f"job {job.id}: model {name!r} is kind {kind!r}, expected {expect_kind!r}"
        )
    return cfg, params, state


def _require_param(job: Job, key: str):
    val = job.params.get(key)
    if not val:
        raise jobs_lib.JobError(f"job {job.id}: missing required param {key!r}")
    return val


def _normalized_entropy(probs: np.ndarray, n_classes: int) -> np.ndarray:
    """-sum(p log p)/log(K) over the trailing class axis, float32 in [0,1]."""
    p32 = probs.astype(np.float32, copy=False)
    ent = -(p32 * np.log(np.maximum(p32, 1e-12))).sum(axis=-1) / np.log(
        n_classes
    )
    return ent.astype(np.float32)


def _out_compression(job: Job) -> str:
    """'deflate' when the job sets ``compress_output``: label maps are
    mostly background and shrink ~50x (Adobe deflate — readable by
    ImageJ/Fiji, tifffile, PIL and our reader). Default stays uncompressed:
    raw fluorescence gains little and the zero-decode layout is the fastest
    for downstream ingest."""
    return "deflate" if job.params.get("compress_output") else "none"


def _append_writer(path: str, est_bytes: float, compression: str = "none"):
    """Page-append writer, BigTIFF when the estimated output could brush
    the classic 4 GiB offset limit (long save_probs runs over big stacks).
    The ~3.25 GiB threshold leaves headroom for IFD overhead (est_bytes is
    the UNCOMPRESSED size, so with deflate it simply stays conservative)."""
    from sequitr_tpu.data import tiff

    return tiff.TiffAppendWriter(
        path, bigtiff=est_bytes > 0xD0000000, compression=compression
    )


# frames up to this many pixels/voxels run whole-frame when the client did
# not request a tiling: ~2048^2 activations fit a v5e chip's HBM comfortably
# and the untiled graph is ~2.1x faster than 384/64 tiling at 1024^2
# (BASELINE.md round-2 sweep: 60.3 vs 28.8 fps)
_WHOLE_FRAME_BUDGET = 4_400_000


def _tile_config(
    params: dict,
    dims: int = 2,
    frame_spatial=None,
    min_multiple: int = 1,
    exact_only: bool = False,
):
    """Tiling policy for a job.

    Explicit ``patch``/``overlap`` params always win. Otherwise, frames
    within the HBM budget run as ONE whole-frame patch (rounded up to the
    model's pooling multiple — the inferrer mirror-pads and crops), which
    is both faster and exact (no overlap-blend seams); larger frames fall
    back to the default sliding-window grid. ``exact_only``: only take the
    whole-frame path when no rounding is needed (the GAN pass has no
    auto-pad stage).
    """
    from sequitr_tpu.pipeline import infer as infer_lib

    default_patch = (256, 256) if dims == 2 else (16, 128, 128)
    default_overlap = (64, 64) if dims == 2 else (4, 32, 32)
    patch = params.get("patch")
    overlap = params.get("overlap")
    if patch is None and frame_spatial is not None:
        rounded = tuple(
            -(-s // min_multiple) * min_multiple for s in frame_spatial
        )
        fits = np.prod(rounded) <= _WHOLE_FRAME_BUDGET
        if fits and (not exact_only or rounded == tuple(frame_spatial)):
            patch = rounded
            overlap = overlap or (0,) * dims
    patch = tuple(patch) if patch is not None else default_patch
    overlap = tuple(overlap) if overlap is not None else default_overlap
    if (
        int(params.get("tta", 1)) == 8
        and dims == 2
        and frame_spatial is not None
    ):
        # 2D tta=8 adds the transpose, which needs a square PADDED frame
        # (the inferrer pads sub-patch axes up to the patch). Deterministic
        # parameter error: fail fast here, never retry (a plain ValueError
        # at trace time would be retried with a full re-trace per attempt).
        padded = tuple(max(s, p) for s, p in zip(frame_spatial, patch))
        if padded[0] != padded[1]:
            raise jobs_lib.JobError(
                f"tta=8 needs a square frame in 2D (transpose variant); "
                f"frame is {tuple(frame_spatial)} -> padded {padded}. "
                "Use tta=4 or a square crop."
            )
    pb = params.get("patch_batch")
    if pb is not None:
        pb = int(pb)
        if pb < 1:
            raise jobs_lib.JobError(
                f"patch_batch must be >= 1 (omit it for auto), got {pb}"
            )
    try:
        return infer_lib.TileConfig(
            patch=patch,
            overlap=overlap,
            window=params.get("window", "hann"),
            normalize=params.get("normalize", "auto"),
            p_lo=float(params.get("p_lo", 5.0)),
            p_hi=float(params.get("p_hi", 99.5)),
            patch_batch=pb,
            # labels leave the device as uint16 (the on-disk format),
            # halving the per-frame label D2H next to int32
            labels_dtype="uint16",
            # job param probs_dtype: "float16" halves probs D2H + disk for
            # save_probs jobs (argmax happens before the cast — labels exact)
            probs_dtype=str(params.get("probs_dtype", "float32")),
            # flip/transpose test-time augmentation: tta x the compute for
            # a fidelity bump (fused into the same graph)
            tta=int(params.get("tta", 1)),
        )
    except ValueError as e:
        # bad tiling/dtype params are deterministic — fail fast, never retry
        raise jobs_lib.JobError(str(e))


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
        exact_only=True,
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
        exact_only=True,
    )

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


def _run_frames(cfg, tc, params, state, source, job: Job):
    """Stream a frame source through tiled inference; yields results in order.

    ``source`` is a ``FrameSource`` (lazy disk readers or an in-memory
    array). This is a GENERATOR: each yielded ``InferenceResult`` holds
    device-resident outputs that the consumer fetches and drops, so neither
    host RAM nor HBM ever holds the whole stack's outputs (round-3
    streaming serving).

    ``data_parallel: true`` shards frames over all devices of a mesh (each
    chip runs the full fused per-frame graph on its shard — zero inter-chip
    traffic; SURVEY.md §3.3) and falls back to single-chip streaming when
    only one device exists. Default: H2D-double-buffered streaming.
    """
    import jax

    from sequitr_tpu.pipeline import infer as infer_lib

    job_params = job.params
    spatial = source.spatial
    n_frames = len(source)
    sp = job_params.get("spatial_parallel")
    if sp and jax.device_count() > 1:
        # huge frames sharded across chips (halo exchange, exact result);
        # use when a single frame exceeds one chip's HBM (SURVEY.md §5).
        # ``true`` = all chips on one frame at a time; an integer S = S-way
        # spatial x (n/S)-way data-parallel HYBRID — S chips split each
        # frame while n/S frames run concurrently (timelapse of giants)
        import jax.numpy as jnp

        from sequitr_tpu import parallel
        from sequitr_tpu.parallel import spatial as spatial_lib

        n_dev = jax.device_count()
        s_ways = _spatial_ways(sp, n_dev, tc=tc)
        d_ways = n_dev // s_ways

        def norm(frame):
            # (H, W) single-channel or (H, W, C) — per-channel percentiles
            f = jnp.asarray(frame)
            if f.ndim == 2:
                return infer_lib._normalize(f[..., None], tc)[..., 0]
            return infer_lib._normalize(f, tc)

        if d_ways > 1 and n_frames > 1:
            mesh2 = parallel.make_mesh2d((d_ways, s_ways))
            try:
                hy_fn = spatial_lib.hybrid_unet2d_infer(
                    cfg, params, state, mesh2, spatial, batch=d_ways,
                    probs_dtype=tc.probs_dtype, labels_dtype=tc.labels_dtype,
                )
            except (ValueError, NotImplementedError) as e:
                # bad shape/config for sharding is deterministic — no retry
                raise jobs_lib.JobError(str(e))
            # one vmapped dispatch normalizes the whole chunk (per-frame
            # percentiles preserved by the vmap axis)
            batch_norm = jax.jit(jax.vmap(norm))
            n_left = n_frames
            for chunk in infer_lib._iter_read_ahead(
                _reads_fail_fast(job, source.chunks(d_ways)), 2
            ):
                probs, labels = hy_fn(params, state, batch_norm(jnp.asarray(chunk)))
                for k in range(min(d_ways, n_left)):
                    yield infer_lib.InferenceResult(probs=probs[k], labels=labels[k])
                n_left -= d_ways
            return
        mesh = parallel.make_mesh(s_ways)
        try:
            sp_fn = spatial_lib.spatial_unet2d_infer(
                cfg, params, state, mesh, spatial,
                probs_dtype=tc.probs_dtype, labels_dtype=tc.labels_dtype,
            )
        except (ValueError, NotImplementedError) as e:
            raise jobs_lib.JobError(str(e))
        for frame in infer_lib._iter_read_ahead(
            _reads_fail_fast(job, source.frames()), 2
        ):
            probs, labels = sp_fn(params, state, norm(frame))
            yield infer_lib.InferenceResult(probs=probs, labels=labels)
        return
    if job_params.get("data_parallel") and jax.device_count() > 1:
        from sequitr_tpu import parallel

        import jax.numpy as jnp

        mesh = parallel.make_mesh()
        n_dev = mesh.devices.size
        fn = infer_lib.make_frame_inferrer(cfg, tc, spatial, jit=False)
        dp = parallel.make_dp_frame_inferrer(fn, mesh)
        n_left = n_frames
        for chunk in infer_lib._iter_read_ahead(
            _reads_fail_fast(job, source.chunks(n_dev)), 2
        ):
            probs, labels = dp(params, state, jnp.asarray(chunk))
            for k in range(min(n_dev, n_left)):
                yield infer_lib.InferenceResult(probs=probs[k], labels=labels[k])
            n_left -= n_dev
        return
    fb = job_params.get("frame_batch")
    fb = int(fb) if fb else _auto_frame_batch(spatial)
    fb = max(1, min(fb, n_frames))  # never compute padded frames nobody asked for
    # entropy maps are computed host-side from the probs, so they need the
    # same async D2H prefetch save_probs gets — without it every frame
    # does a blocking probs transfer after compute
    want_probs = bool(
        job_params.get("save_probs") or job_params.get("save_entropy")
    )
    if fb > 1:
        # small frames are dispatch-bound singly; batch them per dispatch
        # (measured 2.3x at 256^2 — BASELINE.md round 2), keeping the same
        # prefetch-ahead H2D overlap over batch chunks

        def _host_prefetch(out):
            # start async D2H at dispatch for exactly what gets fetched
            infer_lib._copy_to_host_async(out[1])
            if want_probs:
                infer_lib._copy_to_host_async(out[0])

        bfn = infer_lib.cached_batch_inferrer(cfg, tc, tuple(spatial), fb)
        n_left = n_frames
        for probs, labels in infer_lib.stream_frames(
            lambda c: bfn(params, state, c),
            _reads_fail_fast(job, source.chunks(fb)),
            prefetch_host=_host_prefetch,
        ):
            for k in range(min(fb, n_left)):
                yield infer_lib.InferenceResult(probs=probs[k], labels=labels[k])
            n_left -= fb
        return
    fn = infer_lib.cached_frame_inferrer(cfg, tc, tuple(spatial))
    yield from infer_lib.infer_stack(
        fn, params, state, _reads_fail_fast(job, source.frames()),
        fetch_probs=want_probs,
    )


def _apply_roi(job: Job, source):
    """Restrict a FrameSource to the job's ``roi: [y0, x0, y1, x1]``
    (end-exclusive, absolute in the original frame). Frames crop on the
    host before H2D, so the transfer and the compiled graph only see
    the region — serving a subregion of giant frames costs
    proportionally less. ALL outputs (label maps, coords) are ROI-LOCAL
    by design: they stay self-consistent with each other; splice back
    with the roi origin if original-frame coordinates are needed."""
    roi = job.params.get("roi")
    if roi is None:
        return source
    y0, x0, y1, x1 = _parse_roi_values(roi, "roi")
    try:
        return source.crop(y0, x0, y1, x1)
    except ValueError as e:
        raise jobs_lib.JobError(f"bad roi: {e}")


def _parse_roi_values(roi, param: str):
    """Validated [y0, x0, y1, x1] ints (bounds checked by crop())."""
    if not isinstance(roi, (list, tuple)) or len(roi) != 4:
        raise jobs_lib.JobError(
            f"{param}={roi!r} must be [y0, x0, y1, x1] (end-exclusive)"
        )
    try:
        return tuple(int(v) for v in roi)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"{param}={roi!r} must be [y0, x0, y1, x1] (end-exclusive)"
        )


def _apply_frame_range(job: Job, source):
    """Restrict a FrameSource to the job's ``frame_range: [start, stop]``
    (stop exclusive; omitted stop = end of stack). Lazy readers make the
    skip free — reprocessing a segment of a long timelapse reads only it.
    Localization outputs keep ABSOLUTE frame indices (``t`` offsets by
    ``start``) so segment results splice back into full-timelapse tracks."""
    fr = job.params.get("frame_range")
    if fr is None:
        return source
    if not isinstance(fr, (list, tuple)) or not 1 <= len(fr) <= 2:
        # strings would silently iterate characters; dicts would KeyError
        raise jobs_lib.JobError(
            f"frame_range={fr!r} must be [start, stop] (stop exclusive)"
        )
    try:
        start = int(fr[0])
        stop = int(fr[1]) if len(fr) > 1 and fr[1] is not None else None
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"frame_range={fr!r} must be [start, stop] (stop exclusive)"
        )
    try:
        return source.select(start, stop)
    except ValueError as e:
        raise jobs_lib.JobError(str(e))


def _spatial_ways(sp, n_dev: int, divide: bool = True, tc=None) -> int:
    """Parse the ``spatial_parallel`` job param into a shard count.

    Malformed values (non-integer strings, counts that don't fit the
    device mesh) are deterministic JobErrors — never retried. ``tc``:
    reject combinations the halo-exchange graph does not implement
    (currently tta) instead of silently ignoring them."""
    if tc is not None and tc.tta != 1:
        raise jobs_lib.JobError(
            "tta is not supported with spatial_parallel (the halo-exchange "
            "graph runs whole frames; use data_parallel or single-chip)"
        )
    if sp is True:
        return n_dev
    try:
        s_ways = int(sp)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"spatial_parallel={sp!r} must be true or an integer"
        )
    if s_ways < 2 or (divide and n_dev % s_ways) or s_ways > n_dev:
        raise jobs_lib.JobError(
            f"spatial_parallel={sp!r} must be >=2 and "
            + ("divide" if divide else "fit")
            + f" the {n_dev} available devices"
        )
    return s_ways


def _auto_frame_batch(spatial) -> int:
    """Frames per dispatch for single-chip streaming: enough pixels in
    flight to amortize dispatch overhead (~1M px/dispatch), capped at 8."""
    px = int(np.prod(spatial))
    return int(max(1, min(8, 1_000_000 // max(px, 1))))


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
        exact_only=True,
    )
    n_iter = int(p.get("n_iter", 200))
    thresh = float(p.get("cellprob_threshold", 0.5))
    try:
        seg = infer_lib.cached_flows_segmenter(
            cfg, tc, tuple(spatial), n_iter=n_iter,
            step_size=float(p.get("step_size", 1.0)),
            cellprob_threshold=thresh,
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
        cellprob_threshold=thresh,
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


def _parse_patience(p: dict) -> int:
    """Validated early_stop_patience: parameter errors are deterministic
    — fail fast as JobError, never as a retried ValueError."""
    raw = p.get("early_stop_patience", 0)
    try:
        v = int(raw or 0)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"early_stop_patience={raw!r} must be an integer >= 0"
        )
    if v < 0:
        raise jobs_lib.JobError(
            f"early_stop_patience={v} must be >= 0 (0 = off)"
        )
    return v


def _parse_ema_decay(p: dict) -> float:
    raw = p.get("ema_decay", 0.0)
    try:
        v = float(raw or 0.0)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"ema_decay={raw!r} must be a number in [0, 1)"
        )
    if not 0.0 <= v < 1.0:
        raise jobs_lib.JobError(f"ema_decay={v} must be in [0, 1)")
    return v


def _ema_or_raw_params(ckpt_dir: str, fc, state, used_best: bool, subtree=None):
    """Weights to REGISTER for a finished train job: with ``ema_decay``,
    the EMA twin of the checkpoint being registered (ema_best when
    keep_best selected it, else ema_final) — the classic serving-quality
    smoothing; raw weights otherwise (and raw stays in the ordinary
    checkpoints either way, so resume semantics never change)."""
    from sequitr_tpu.pipeline import train as train_lib

    if not fc.ema_decay:
        return state.params
    # pair like with like: when keep_best selected the registered state,
    # ONLY its own ema_best twin may replace the params — mixing a
    # final-step EMA with best-step model_state (BN stats) would serve
    # weights and statistics from different training points
    name = "ema_best" if used_best else "ema_final"
    path = os.path.join(ckpt_dir, name)
    if not os.path.isdir(path):
        log.warning(
            "ema_decay set but %s missing (checkpoint predates EMA?); "
            "registering raw weights", path,
        )
        return state.params
    template = state.params[subtree] if subtree else state.params
    ema = train_lib.restore_checkpoint(path, template)
    if subtree:
        return dict(state.params, **{subtree: ema})
    return ema


def _train_mesh(p: dict, batch_size: int):
    """Mesh for ``data_parallel: true`` training jobs (SURVEY.md:151-152).

    Shards the batch over all devices; falls back to single-chip when only
    one device exists. The batch must divide evenly over the mesh — raise
    up front instead of letting XLA fail mid-job with a sharding error."""
    if not p.get("data_parallel"):
        return None
    import jax

    if jax.device_count() <= 1:
        return None
    from sequitr_tpu import parallel

    mesh = parallel.make_mesh()
    n = mesh.devices.size
    if batch_size % n:
        raise jobs_lib.JobError(
            f"data_parallel: batch_size {batch_size} not divisible by {n} devices"
        )
    return mesh


def unet_config_from_params(p: dict):
    import jax.numpy as jnp

    from sequitr_tpu.models import unet

    if "preset" in p:
        from sequitr_tpu.models import zoo

        return zoo.get(p["preset"])
    return unet.UNetConfig(
        in_channels=int(p.get("in_channels", 1)),
        num_classes=int(p.get("num_classes", 3)),
        depth=int(p.get("depth", 4)),
        base_features=int(p.get("base_features", 32)),
        dims=int(p.get("dims", 2)),
        norm=p.get("norm", "batch"),
        compute_dtype=jnp.dtype(p.get("compute_dtype", "bfloat16")),
        space_to_depth=int(p.get("space_to_depth", 1)),
    )


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
        exact_only=True,
    )
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
    (default 4), ``normalize`` (default true — record/serve
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
                        lab_stack[t].astype(np.int64), n_rays=n_rays
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


def _resolve_globs(job: Job):
    """Record-shard input entries: globs pass through, a directory means
    its *.tfrecord members (the same directory convention FrameSource
    gives TIFF inputs — a build_records OUTPUT DIR is a valid train
    input, which is what depends_on chains naturally produce)."""
    if not job.input:
        raise jobs_lib.JobError(f"job {job.id}: no input paths")
    return [
        os.path.join(p, "*.tfrecord") if os.path.isdir(p) else p
        for p in job.input
    ]


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


def _parse_ignore_label(job: Job):
    """``ignore_label`` as int or None; malformed is a deterministic
    JobError (shared by build_records and the evaluate family so the
    three sites cannot drift)."""
    ig = job.params.get("ignore_label")
    if ig is None:
        return None
    try:
        return int(ig)
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"ignore_label={job.params.get('ignore_label')!r} must be an int"
        )


def _check_ignore_collision(ignore_label, num_classes: int) -> None:
    if ignore_label is not None and 0 <= ignore_label < num_classes:
        raise jobs_lib.JobError(
            f"ignore_label={ignore_label} collides with the class range "
            f"[0, {num_classes}) — use a value outside it (e.g. 255)"
        )


def _parse_eval_ignore(job: Job, k: int):
    """The evaluate family's ``ignore_label``: ground truth carrying this
    value is excluded from every metric (the evaluation twin of
    build_records' sparse-annotation support — score only where a human
    actually annotated). Deterministic errors on malformed/colliding
    values."""
    ig = _parse_ignore_label(job)
    _check_ignore_collision(ig, k)
    return ig


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


def _dp_chunk_stream(
    job: Job, chunks_iter, n_items: int, chunk_n: int,
    phase: str = "chunks",
):
    """Yield ``(chunk, n_real)`` over a padded chunk stream — the shared
    scaffolding of every chunked DP dispatch loop (2D/astig/3D
    localization, deconvolution): disk read-ahead overlapping the
    dispatch, per-chunk progress/cancel, fail-fast reads, and the
    tail-padding count so consumers never emit padded rows."""
    from sequitr_tpu.pipeline import infer as infer_lib

    n_chunks = (n_items + chunk_n - 1) // chunk_n
    it = jobs_lib.track(
        job,
        infer_lib._iter_read_ahead(chunks_iter, 2),
        total=n_chunks, phase=phase,
    )
    left = n_items
    for chunk in _reads_fail_fast(job, iter(it)):
        yield chunk, min(chunk_n, left)
        left -= chunk_n


def _reads_fail_fast(job: Job, it):
    """Re-raise a source read ValueError as a deterministic JobError.

    Read-ahead producers (``_iter_read_ahead``) surface their read
    errors at the consumer's ``next()``; corrupt input is deterministic,
    so it must not burn retries."""
    while True:
        try:
            item = next(it)
        except StopIteration:
            return
        except ValueError as e:
            raise jobs_lib.JobError(f"job {job.id}: {e}")
        yield item


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


def _volume_chunks(seq, n: int):
    """float32 view of ``VolumeSequence.chunks`` (the DP dispatch feed —
    localization dispatches take float32; denoise casts at device_put)."""
    for c in seq.chunks(n):
        yield np.asarray(c, np.float32)


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


def _frame_or_fail(job: Job, source, t: int, volume: bool = False):
    """Read frame/volume ``t`` from a quantification input; a corrupt
    page mid-stack is deterministic — fail fast instead of burning
    retries (the direct-read twin of ``_reads_fail_fast``)."""
    try:
        return np.asarray(source.volume(t) if volume else source.frame(t))
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: corrupt input at t={t}: {e}")


def _instances_from_labels(lab: np.ndarray) -> np.ndarray:
    """Trust a label map's ids AS instance ids (``instances: true``):
    renumber densely to 1..n in ascending-id order, no CCL/watershed.

    The semantics for stacks produced by an INSTANCE segmenter
    (``segment_flows``): re-deriving connected components would merge
    the touching cells the segmenter just separated."""
    lab = np.ascontiguousarray(lab.astype(np.int32, copy=False))
    ids = np.unique(lab[lab > 0])
    if ids.size == 0:
        return np.zeros(lab.shape, np.int32)
    if int(ids[-1]) == ids.size:
        return lab  # already dense 1..n
    remap = np.zeros(int(ids[-1]) + 1, np.int32)
    remap[ids] = np.arange(1, ids.size + 1, dtype=np.int32)
    return remap[np.maximum(lab, 0)]


def _check_instances_params(instances: bool, split_touching: bool) -> None:
    if instances and split_touching:
        raise jobs_lib.JobError(
            "instances: true means the label stack already carries one id "
            "per object — split_touching would re-derive them; drop one"
        )


def _derive_objects(lab: np.ndarray, split_touching: bool,
                    min_distance: int, min_area: int,
                    instances: bool = False):
    """Shared object semantics for the quantification pipelines
    (measure_objects / count_spots): a label frame -> instance map +
    per-object stats + the min_area keep mask.

    Returns ``(inst, n, areas, classes, keep, cy, cx)`` — ``inst`` int32
    with ids 1..n, ``keep`` a bool mask over ids (index id-1), ``cy/cx``
    per-object centroids. A multi-channel label frame is a deterministic
    JobError. ``instances``: trust the label ids as instance ids
    (segment_flows stacks — CCL would re-merge touching cells); the
    class column is 1 for every object (instance maps carry no class).
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu import native

    if lab.ndim == 3:
        raise jobs_lib.JobError(
            f"labels entry must be single-channel (got {lab.shape})"
        )
    lab = lab.astype(np.int32, copy=False)
    if instances:
        inst = _instances_from_labels(lab)
        lab = (inst > 0).astype(np.int32)  # class 1 everywhere
    elif split_touching:
        inst = loc_lib.split_touching_instances(
            lab, min_distance=min_distance
        )
    else:
        inst = loc_lib.label_components(lab > 0)
    n = int(inst.max())
    if n == 0:
        z = np.zeros(0, np.int64)
        return inst, 0, z, z, np.zeros(0, bool), z, z
    kcls = int(lab.max()) + 1
    areas, cy, cx, _, classes = native.label_full_stats(
        inst, lab, None, n, kcls
    )
    return inst, n, areas, classes, areas >= min_area, cy, cx


def _derive_objects_3d(lab: np.ndarray, split_touching: bool,
                       min_distance: int, min_area: int,
                       instances: bool = False):
    """Volumetric twin of ``_derive_objects`` for (Z, H, W) label volumes:
    6-connected 3D components (or the 3D watershed under
    ``split_touching``, or the ids themselves under ``instances``) + the
    single-sweep 3D native stats. Returns
    ``(inst, n, areas, classes, keep, cz, cy, cx)``."""
    from scipy import ndimage

    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu import native

    if lab.ndim != 3:
        raise jobs_lib.JobError(
            f"dims=3 labels must be (Z, H, W) volumes (got {lab.shape})"
        )
    lab = lab.astype(np.int32, copy=False)
    if instances:
        inst = _instances_from_labels(lab)
        lab = (inst > 0).astype(np.int32)  # class 1 everywhere
        n = int(inst.max())
    elif split_touching:
        inst = loc_lib.split_touching_instances(
            lab, min_distance=min_distance
        )
        n = int(inst.max())
    else:
        structure = ndimage.generate_binary_structure(3, 1)
        inst, n = ndimage.label(lab > 0, structure=structure)
    if n == 0:
        zz = np.zeros(0, np.int64)
        return inst, 0, zz, zz, np.zeros(0, bool), zz, zz, zz
    kcls = int(lab.max()) + 1
    areas, cz, cy, cx, _, classes = native.label_full_stats_3d(
        inst, lab, None, n, kcls
    )
    return inst, n, areas, classes, areas >= min_area, cz, cy, cx


def _measure_objects_3d(job: Job, paths) -> Dict[str, str]:
    """Volumetric ``measure_objects`` (``dims: 3``): per-object
    quantification over a timelapse of z-stacks.

    Same contract as the 2D path with the volume-timelapse input
    conventions every 3D pipeline shares (one z-stack file per timepoint
    via directory/glob entries, or a single T·Z-page file with ``z``
    pages-per-volume): a label volume sequence defines the objects (3D
    6-connected components, or the 3D watershed under
    ``split_touching``), each further entry is an intensity channel
    sequence. measurements.csv rows
    ``t,id,class,area,z,y,x,mean_c0..[,coloc cols]`` — volumes carry a z
    centroid; ``colocalize`` works unchanged (the pair statistics are
    connectivity-agnostic bincount reductions over the instance map).
    """
    from sequitr_tpu import native
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.ops import colocalize as coloc_lib
    from sequitr_tpu.utils import PhaseTimer

    p = job.params
    z = _parse_z_pages(job)
    try:
        lsource = VolumeSequence(paths[0], z=z)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read labels: {e}")
    csources = []
    try:
        for p_ in paths[1:]:
            try:
                csources.append(VolumeSequence(p_, z=z))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        lsource = _apply_frame_range(job, lsource)
        for k, cs in enumerate(csources):
            if cs.spatial != lsource.spatial:
                raise jobs_lib.JobError(
                    f"channel {k}: volume shape {cs.spatial} != labels "
                    f"{lsource.spatial}"
                )
        csources = [_apply_frame_range(job, cs) for cs in csources]
        for k, cs in enumerate(csources):
            if len(cs) != len(lsource):
                raise jobs_lib.JobError(
                    f"channel {k}: {len(cs)} timepoint(s) != labels "
                    f"{len(lsource)}"
                )
        min_area = int(p.get("min_area", 1))
        split_touching = bool(p.get("split_touching", False))
        instances = bool(p.get("instances", False))
        _check_instances_params(instances, split_touching)
        min_distance = int(p.get("min_distance", 5))
        colocalize = bool(p.get("colocalize", False))
        thr_spec = p.get("coloc_threshold", "otsu")
        if colocalize and len(csources) < 2:
            raise jobs_lib.JobError(
                "colocalize needs >= 2 intensity channels, got "
                f"{len(csources)}"
            )
        if colocalize:
            try:
                coloc_lib.validate_threshold_spec(thr_spec, len(csources))
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: {e}")
    except BaseException:
        lsource.close()
        for cs in csources:
            cs.close()
        raise

    timer = PhaseTimer()
    n_vols = len(lsource)
    n_ch = len(csources)
    pairs = (
        [(i, j) for i in range(n_ch) for j in range(i + 1, n_ch)]
        if colocalize else []
    )
    out_path = os.path.join(job.output, "measurements.csv")
    tmp = out_path + ".tmp"
    rep = jobs_lib.ProgressReporter(job, n_vols)
    n_rows = 0
    t0 = time.time()
    try:
        with open(tmp, "w") as f:
            f.write(
                "t,id,class,area,z,y,x,"
                + ",".join(f"mean_c{k}" for k in range(n_ch))
                + "".join(
                    f",pearson_c{i}c{j},m1_c{i}c{j},m2_c{i}c{j}"
                    for i, j in pairs
                )
                + "\n"
            )
            for t in range(n_vols):
                with timer.phase("read"):
                    lab = _frame_or_fail(job, lsource, t, volume=True)
                    chans = [
                        _frame_or_fail(job, cs, t, volume=True).astype(
                            np.float32, copy=False
                        )
                        for cs in csources
                    ]
                with timer.phase("measure"):
                    inst, n, areas, classes, keep_mask, cz, cy, cx = (
                        _derive_objects_3d(
                            lab, split_touching, min_distance, min_area,
                            instances=instances,
                        )
                    )
                    if n == 0:
                        rep.step()
                        continue
                    lab_i = lab.astype(np.int32, copy=False)
                    kcls = int(lab_i.max()) + 1
                    means = [
                        native.label_full_stats_3d(
                            inst, lab_i, ch, n, kcls
                        )[4]
                        for ch in chans
                    ]
                    keep = np.flatnonzero(keep_mask)
                    if pairs:
                        pair_stats = coloc_lib.object_coloc_pairs(
                            inst, n, chans,
                            coloc_lib.resolve_thresholds(chans, thr_spec),
                        )
                with timer.phase("write"):
                    t_abs = t + lsource.frame_offset
                    for i in keep:
                        f.write(
                            f"{t_abs},{i + 1},{int(classes[i])},"
                            f"{int(areas[i])},{cz[i]:.4f},{cy[i]:.4f},"
                            f"{cx[i]:.4f},"
                            + ",".join(f"{m[i]:.6g}" for m in means)
                            + "".join(
                                f",{pair_stats[pr]['pearson'][i]:.6g}"
                                f",{pair_stats[pr]['m1'][i]:.6g}"
                                f",{pair_stats[pr]['m2'][i]:.6g}"
                                for pr in pairs
                            )
                            + "\n"
                        )
                    n_rows += len(keep)
                rep.step()
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    finally:
        lsource.close()
        for cs in csources:
            cs.close()
    os.replace(tmp, out_path)
    rep.finish()
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_objects=n_rows, n_frames=n_vols, n_channels=n_ch,
    )
    return {"measurements": out_path, "metrics": json.dumps(metrics)}


@register("measure_objects")
def measure_objects(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Per-object intensity quantification across channels (no model).

    The classic "segment on one channel, measure the others" workflow:
    a label stack (a segmentation job's ``labels.tif``, chained via
    ``depends_on``, or any integer mask stack) defines the objects, and
    each additional input entry is an intensity channel quantified per
    object. The instance map is computed ONCE per frame; each channel
    then reuses it through the single-sweep native stats
    (``native.label_full_stats``), so K channels cost one CCL + K sweeps.
    This is an extension beyond the reference's capability list (its
    localization measured only the segmentation input's own intensity).

    input: [labels entry, intensity entry 1, ..., intensity entry K]
    (each a stack / dir / glob; all same (T, H, W); K >= 1). params:

    * ``min_area`` (default 1): drop smaller objects.
    * ``split_touching`` (default false) + ``min_distance`` (default 5):
      watershed-split abutting cells, same semantics as segmentation.
    * ``frame_range``: [start, stop) timepoints (absolute t in the CSV).
    * ``dims: 3``: VOLUMETRIC quantification over a timelapse of
      z-stacks (``_measure_objects_3d``) — inputs follow the shared
      volume conventions (per-timepoint files or a single T·Z-page file
      with ``z``); rows gain a z centroid column.
    * ``colocalize`` (default false; needs >= 2 channels): per-object
      colocalization for every channel pair — Pearson correlation over
      the object's pixels plus Manders M1/M2 split coefficients
      (``ops/colocalize.py``; columns ``pearson_c{i}c{j}``,
      ``m1_c{i}c{j}`` = fraction of channel i intensity inside channel
      j-positive pixels, ``m2`` the converse; ``nan`` where undefined —
      zero variance / zero intensity). ``coloc_threshold``: "otsu"
      (default, per frame per channel), a number, or a per-channel list
      of absolute positivity thresholds for the Manders terms.

    Outputs: measurements.csv with one row per object:
    ``t,id,class,area,y,x,mean_c0,...,mean_c{K-1}[,coloc cols]`` — ``id``
    is the per-frame instance number, ``class`` the majority semantic
    label of the object's pixels, means are per-channel averages over
    the object's pixels. Metrics: n_objects, n_frames, n_channels.
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu import native
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import colocalize as coloc_lib
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    if len(paths) < 2:
        raise jobs_lib.JobError(
            "measure_objects needs [labels, intensity channel(s)...] "
            f"(>= 2 inputs), got {len(paths)}"
        )
    try:
        dims = int(job.params.get("dims", 2))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"dims={job.params.get('dims')!r} must be 2 or 3"
        )
    if dims == 3:
        return _measure_objects_3d(job, paths)
    if dims != 2:
        raise jobs_lib.JobError(f"dims={dims} must be 2 or 3")
    try:
        lsource = FrameSource(paths=[paths[0]])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read labels: {e}")
    csources = []
    # open channels + validate; close every lazy reader on a rejected
    # submission (warm workers must not leak fds)
    try:
        for p_ in paths[1:]:
            try:
                csources.append(FrameSource(paths=[p_]))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        lsource = _apply_frame_range(job, lsource)
        for k, cs in enumerate(csources):
            if cs.spatial != lsource.spatial:
                raise jobs_lib.JobError(
                    f"channel {k}: spatial {cs.spatial} != labels "
                    f"{lsource.spatial}"
                )
        csources = [_apply_frame_range(job, cs) for cs in csources]
        for k, cs in enumerate(csources):
            if len(cs) != len(lsource):
                raise jobs_lib.JobError(
                    f"channel {k}: {len(cs)} frame(s) != labels "
                    f"{len(lsource)}"
                )
        p = job.params
        min_area = int(p.get("min_area", 1))
        split_touching = bool(p.get("split_touching", False))
        instances = bool(p.get("instances", False))
        _check_instances_params(instances, split_touching)
        min_distance = int(p.get("min_distance", 5))
        colocalize = bool(p.get("colocalize", False))
        thr_spec = p.get("coloc_threshold", "otsu")
        if colocalize and len(csources) < 2:
            raise jobs_lib.JobError(
                "colocalize needs >= 2 intensity channels, got "
                f"{len(csources)}"
            )
        if colocalize:
            # malformed specs fail fast at submit time, not after N
            # frames (or never, on an all-empty stack) — review finding
            try:
                coloc_lib.validate_threshold_spec(thr_spec, len(csources))
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: {e}")
    except BaseException:
        lsource.close()
        for cs in csources:
            cs.close()
        raise

    timer = PhaseTimer()
    n_frames = len(lsource)
    n_ch = len(csources)
    pairs = (
        [(i, j) for i in range(n_ch) for j in range(i + 1, n_ch)]
        if colocalize else []
    )
    out_path = os.path.join(job.output, "measurements.csv")
    tmp = out_path + ".tmp"
    rep = jobs_lib.ProgressReporter(job, n_frames)
    n_rows = 0
    t0 = time.time()
    try:
        with open(tmp, "w") as f:
            f.write(
                "t,id,class,area,y,x,"
                + ",".join(f"mean_c{k}" for k in range(n_ch))
                + "".join(
                    f",pearson_c{i}c{j},m1_c{i}c{j},m2_c{i}c{j}"
                    for i, j in pairs
                )
                + "\n"
            )
            with lsource:
                for t in range(n_frames):
                    with timer.phase("read"):
                        lab = _frame_or_fail(job, lsource, t)
                        chans = [
                            _frame_or_fail(job, cs, t).astype(np.float32, copy=False)
                            for cs in csources
                        ]
                    with timer.phase("measure"):
                        inst, n, areas, classes, keep_mask, cy, cx = (
                            _derive_objects(
                                lab, split_touching, min_distance, min_area,
                                instances=instances,
                            )
                        )
                        if n == 0:
                            rep.step()
                            continue
                        lab_i = lab.astype(np.int32, copy=False)
                        kcls = int(lab_i.max()) + 1
                        means = [
                            native.label_full_stats(
                                inst, lab_i, ch, n, kcls
                            )[3]
                            for ch in chans
                        ]
                        keep = np.flatnonzero(keep_mask)
                        if pairs:
                            pair_stats = coloc_lib.object_coloc_pairs(
                                inst, n, chans,
                                coloc_lib.resolve_thresholds(chans, thr_spec),
                            )
                    with timer.phase("write"):
                        t_abs = t + lsource.frame_offset
                        for i in keep:
                            f.write(
                                f"{t_abs},{i + 1},{int(classes[i])},"
                                f"{int(areas[i])},{cy[i]:.4f},{cx[i]:.4f},"
                                + ",".join(
                                    f"{m[i]:.6g}" for m in means
                                )
                                + "".join(
                                    f",{pair_stats[pr]['pearson'][i]:.6g}"
                                    f",{pair_stats[pr]['m1'][i]:.6g}"
                                    f",{pair_stats[pr]['m2'][i]:.6g}"
                                    for pr in pairs
                                )
                                + "\n"
                            )
                        n_rows += len(keep)
                    rep.step()
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    finally:
        for cs in csources:
            cs.close()
    os.replace(tmp, out_path)
    rep.finish()
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_objects=n_rows, n_frames=n_frames, n_channels=n_ch,
    )
    return {"measurements": out_path, "metrics": json.dumps(metrics)}


@register("count_spots")
def count_spots(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Assign localized emitters to segmented objects (spots per cell).

    The FISH/smFISH workflow: a segmentation defines the cells, a
    single-molecule localization provides the spots, and the biology
    lives in the per-cell spot counts. input: [labels entry,
    emitters.csv] — the labels entry (a segmentation job's ``labels.tif``
    or any integer mask stack) defines objects per frame; the
    emitters.csv (a ``localize_emitters`` job's output — plain,
    astigmatic and volumetric layouts all parse; only the t/y/x columns
    drive the planar assignment) provides detections. Chains from both
    producers via ``depends_on``. Host-side (irregular per-frame joins,
    SURVEY.md §3.5). An extension beyond the reference's capability list.

    params:

    * ``min_area`` / ``split_touching`` / ``min_distance``: object
      semantics as in ``measure_objects`` (spots on objects dropped by
      ``min_area`` count as unassigned).
    * ``capture_radius`` (default 0.0 px): spots landing on background
      are assigned to the nearest object within this distance (EDT
      nearest-instance lookup — membrane-proximal spots the mask just
      misses); 0 = strict inside-the-mask assignment.
    * ``frame_range``: [start, stop) label timepoints; emitter rows
      outside it are dropped.
    * ``dims: 3``: VOLUMETRIC assignment — the labels entry follows the
      shared volume-timelapse conventions (per-timepoint z-stack files
      or one T·Z-page file with ``z``), the emitters csv must carry a z
      column (a ``localize_emitters dims: 3`` run), and spots join on
      their rounded (z, y, x) voxel (capture_radius becomes a 3D
      distance in voxels — set ``z_scale`` upstream if z is not in
      voxels).

    Outputs: spots.csv (the emitters rows + an ``object_id`` column,
    -1 = unassigned) and spot_counts.csv (``t,id,class,area,n_spots`` —
    one row per object INCLUDING zero-spot objects: "no signal in this
    cell" is a measurement). Metrics: n_spots, n_assigned, n_objects,
    spots_per_object_mean.
    """
    from sequitr_tpu.data.source import FrameSource, VolumeSequence
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    if len(paths) != 2:
        raise jobs_lib.JobError(
            f"count_spots needs [labels, emitters.csv], got {len(paths)} "
            "input(s)"
        )
    lab_path, em_path = paths
    if lab_path.endswith(".csv"):  # a natural argument-order slip
        lab_path, em_path = em_path, lab_path
    p = job.params
    try:
        dims = int(p.get("dims", 2))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(f"dims={p.get('dims')!r} must be 2 or 3")
    if dims not in (2, 3):
        raise jobs_lib.JobError(f"dims={dims} must be 2 or 3")
    try:
        if dims == 3:
            lsource = VolumeSequence(lab_path, z=_parse_z_pages(job))
        else:
            lsource = FrameSource(paths=[lab_path])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read labels: {e}")
    # per-spot coordinate column names, axis order matching the label
    # array's (z, )y, x layout
    axes = ("z", "y", "x") if dims == 3 else ("y", "x")
    try:
        lsource = _apply_frame_range(job, lsource)
        try:
            min_area = int(p.get("min_area", 1))
            split_touching = bool(p.get("split_touching", False))
            instances = bool(p.get("instances", False))
            min_distance = int(p.get("min_distance", 5))
            radius = float(p.get("capture_radius", 0.0))
        except (TypeError, ValueError) as e:
            raise jobs_lib.JobError(f"job {job.id}: bad param: {e}")
        _check_instances_params(instances, split_touching)
        if radius < 0:
            raise jobs_lib.JobError(
                f"capture_radius must be >= 0, got {radius}"
            )
        try:
            with open(em_path) as ef:
                header = ef.readline().strip()
                cols = header.split(",")
                try:
                    c_t = cols.index("t")
                    c_ax = [cols.index(a) for a in axes]
                except ValueError:
                    raise jobs_lib.JobError(
                        f"emitters csv must have t,{','.join(axes)} "
                        f"columns, got {header!r}"
                    )
                by_t: Dict[int, list] = {}
                for line in ef:
                    line = line.strip()
                    if not line:
                        continue
                    parts = line.split(",")
                    try:
                        t_row = int(float(parts[c_t]))
                        coords = tuple(float(parts[c]) for c in c_ax)
                    except (ValueError, IndexError):
                        raise jobs_lib.JobError(
                            f"malformed emitters row: {line!r}"
                        )
                    by_t.setdefault(t_row, []).append((coords, line))
        except OSError as e:
            raise jobs_lib.JobError(
                f"job {job.id}: cannot read emitters: {e}"
            )
    except BaseException:
        lsource.close()
        raise

    timer = PhaseTimer()
    n_frames = len(lsource)
    spots_path = os.path.join(job.output, "spots.csv")
    counts_path = os.path.join(job.output, "spot_counts.csv")
    rep = jobs_lib.ProgressReporter(job, n_frames)
    n_spots = n_assigned = n_objects = 0
    t0 = time.time()
    try:
        with open(spots_path + ".tmp", "w") as sf, \
                open(counts_path + ".tmp", "w") as cf, lsource:
            sf.write(header + ",object_id\n")
            cf.write("t,id,class,area,n_spots\n")
            for t in range(n_frames):
                t_abs = t + lsource.frame_offset
                with timer.phase("read"):
                    lab = _frame_or_fail(job, lsource, t, volume=dims == 3)
                with timer.phase("assign"):
                    if dims == 3:
                        inst, n, areas, classes, keep = _derive_objects_3d(
                            lab, split_touching, min_distance, min_area,
                            instances=instances,
                        )[:5]
                    else:
                        inst, n, areas, classes, keep = _derive_objects(
                            lab, split_touching, min_distance, min_area,
                            instances=instances,
                        )[:5]
                    # assignment sees only KEPT objects: a spot next to a
                    # min_area-dropped speck must still capture to a real
                    # object in range (review finding — the EDT used to
                    # resolve to the nearest instance including dropped
                    # ones, stranding the spot)
                    inst_kept = (
                        np.where(keep[np.maximum(inst - 1, 0)], inst, 0)
                        if n else inst
                    )
                    rows = by_t.get(t_abs, [])
                    oids = np.full(len(rows), -1, np.int64)
                    if rows and n:
                        idx = [
                            np.rint(
                                np.asarray([r[0][a] for r in rows])
                            ).astype(int)
                            for a in range(len(axes))
                        ]
                        # out-of-frame coordinates (emitters from a
                        # different ROI/crop) are unassigned, never
                        # snapped to the border (review finding)
                        inb = np.ones(len(rows), bool)
                        for iv, lim in zip(idx, inst.shape):
                            inb &= (iv >= 0) & (iv < lim)
                        clipped = tuple(
                            np.clip(iv, 0, lim - 1)
                            for iv, lim in zip(idx, inst.shape)
                        )
                        hit = np.where(inb, inst_kept[clipped], 0)
                        bg = inb & (hit == 0)
                        if radius > 0 and bg.any():
                            from scipy import ndimage

                            dist, nearest = ndimage.distance_transform_edt(
                                inst_kept == 0, return_indices=True
                            )
                            at = tuple(iv[bg] for iv in idx)
                            close = dist[at] <= radius
                            near = inst_kept[
                                tuple(nearest[a][at] for a in range(len(axes)))
                            ]
                            hit[bg] = np.where(close, near, 0)
                        oids = np.where(hit > 0, hit, -1).astype(np.int64)
                    counts = np.bincount(
                        oids[oids > 0], minlength=n + 1
                    ) if n else np.zeros(1, np.int64)
                with timer.phase("write"):
                    for (_, line), oid in zip(rows, oids):
                        sf.write(f"{line},{int(oid)}\n")
                    for i in np.flatnonzero(keep):
                        cf.write(
                            f"{t_abs},{i + 1},{int(classes[i])},"
                            f"{int(areas[i])},{int(counts[i + 1])}\n"
                        )
                    n_spots += len(rows)
                    n_assigned += int((oids > 0).sum())
                    n_objects += int(keep.sum())
                rep.step()
    except BaseException:
        for pth in (spots_path, counts_path):
            try:
                os.unlink(pth + ".tmp")
            except OSError:
                pass
        raise
    os.replace(spots_path + ".tmp", spots_path)
    os.replace(counts_path + ".tmp", counts_path)
    rep.finish()
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_spots=n_spots, n_assigned=n_assigned, n_objects=n_objects,
        spots_per_object_mean=round(n_assigned / max(n_objects, 1), 3),
    )
    return {
        "spots": spots_path,
        "spot_counts": counts_path,
        "metrics": json.dumps(metrics),
    }


def _read_tracks_csv(path: str):
    """tracks.csv -> ``({t: [(y, x, z, track_id), ...]}, max_track_id)``
    (shared by export_ctc and measure_tracks — one parser, one set of
    malformed-row semantics)."""
    by_t: Dict[int, list] = {}
    max_tid = -1
    with open(path) as f:
        cols = f.readline().strip().split(",")
        try:
            c_id, c_t, c_x, c_y = (
                cols.index("track_id"), cols.index("t"),
                cols.index("x"), cols.index("y"),
            )
        except ValueError:
            raise jobs_lib.JobError(
                f"{path}: not a tracks.csv (columns {cols})"
            )
        c_z = cols.index("z") if "z" in cols else None
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 4:
                continue
            try:
                tid = int(parts[c_id])
                t_row = int(float(parts[c_t]))
                y = float(parts[c_y])
                x = float(parts[c_x])
                z = float(parts[c_z]) if c_z is not None else 0.0
            except ValueError:
                raise jobs_lib.JobError(
                    f"malformed tracks row: {line.strip()!r}"
                )
            by_t.setdefault(t_row, []).append((y, x, z, tid))
            max_tid = max(max_tid, tid)
    return by_t, max_tid


def _match_centroids(pts, cand_pts, tol: float):
    """Gated ONE-TO-ONE greedy nearest assignment of N-D points.

    ``pts`` (n, d) query points, ``cand_pts`` (m, d) candidates; returns
    a length-n list of candidate indices (-1 = no match within ``tol``).
    k-nearest candidates sorted by distance, each side used once —
    per-query nearest alone double-books a candidate when two queries
    share a position (the ring-plus-center-fragment case). Shared by
    export_ctc and measure_tracks.
    """
    from scipy.spatial import cKDTree

    assign = [-1] * len(pts)
    if not len(pts) or not len(cand_pts):
        return assign
    tree = cKDTree(np.asarray(cand_pts))
    k = min(3, len(cand_pts))
    d, idx = tree.query(
        np.asarray(pts), k=k, distance_upper_bound=tol
    )
    d = d.reshape(len(pts), -1)
    idx = idx.reshape(len(pts), -1)
    order = sorted(
        (float(d[a, b]), a, int(idx[a, b]))
        for a in range(len(pts)) for b in range(d.shape[1])
        if np.isfinite(d[a, b])
    )
    used_p, used_c = set(), set()
    for _, a, j in order:
        if a in used_p or j in used_c:
            continue
        used_p.add(a)
        used_c.add(j)
        assign[a] = j
    return assign


@register("measure_tracks")
def measure_tracks(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Join a tracking run onto per-object measurements: intensity
    traces per track (the reporter-over-lineage product).

    The completion of the segment -> measure -> track triangle: a
    ``measure_objects`` run quantifies channels per object per frame, a
    ``track_objects`` run links the same objects through time — this
    joins them by (t, centroid) so every measurement row gains its track
    identity, yielding per-track multi-channel time series (cell-cycle
    reporters, signalling dynamics, photobleaching per clone). input:
    [measure_objects output dir (or measurements.csv), track_objects
    output dir (or tracks.csv)] — chain all three with ``depends_on``.

    Join: KD-tree on each frame's tracking detections, gated one-to-one
    within ``match_tol`` (default 0.1 px — both CSVs store the SAME
    native-sweep centroids at 3-4 decimals, so genuine joins are exact;
    run both steps with the same object params). Volumetric runs join in
    full (y, x, z) when the measurements carry a z column (``dims: 3``).
    Measurement rows with no tracking row keep ``track_id -1``
    (min_track_length-filtered blips). Zero joins with rows on both
    sides is a deterministic JobError (mismatched object params);
    tracking rows that match no measurement (a ``frame_range`` subset,
    or differing object params) surface as ``n_unjoined_track_rows`` +
    a runtime warning so truncated traces never look complete.

    Outputs: traces.csv — the measurement columns with ``track_id``
    prepended, sorted by (track_id, t); track -1 rows last. Metrics:
    n_rows, n_joined, n_unjoined, n_unjoined_track_rows, n_tracks.
    """
    paths = _resolve_inputs(job)
    if len(paths) != 2:
        raise jobs_lib.JobError(
            "measure_tracks needs [measurements, tracking output], got "
            f"{len(paths)} input(s)"
        )

    def _as_file(p_, name):
        return os.path.join(p_, name) if os.path.isdir(p_) else p_

    meas_path = _as_file(paths[0], "measurements.csv")
    trk_path = _as_file(paths[1], "tracks.csv")
    alt_m = _as_file(paths[1], "measurements.csv")
    alt_t = _as_file(paths[0], "tracks.csv")

    def _header(p_):
        try:
            with open(p_) as f:
                return f.readline().strip().split(",")
        except OSError:
            return None

    # accept either argument order, sniffed by HEADER (path existence
    # alone cannot disambiguate two explicit .csv paths — review fix):
    # the tracks side is the one carrying a track_id column
    def _sides_ok(m, t):
        hm, ht = _header(m), _header(t)
        return (
            hm is not None and ht is not None
            and "track_id" in ht and "track_id" not in hm
        )

    if _sides_ok(meas_path, trk_path):
        pass
    elif _sides_ok(alt_m, alt_t):
        meas_path, trk_path = alt_m, alt_t
    else:
        raise jobs_lib.JobError(
            f"cannot resolve measurements.csv + tracks.csv from {paths!r} "
            "(the tracks side must carry a track_id column)"
        )
    h_m = _header(meas_path)
    p = job.params
    try:
        tol = float(p.get("match_tol", 0.1))
    except (TypeError, ValueError) as e:
        raise jobs_lib.JobError(f"job {job.id}: bad param: {e}")
    if tol <= 0:
        raise jobs_lib.JobError(f"match_tol must be > 0, got {tol}")

    mcols = h_m
    try:
        mix = {c: mcols.index(c) for c in ("t", "y", "x")}
    except ValueError:
        raise jobs_lib.JobError(
            f"{meas_path}: needs columns ('t', 'y', 'x'), got {mcols}"
        )
    use_z = "z" in mcols  # volumetric measurements join in 3D
    if use_z:
        mix["z"] = mcols.index("z")
    mrows = []
    with open(meas_path) as f:
        f.readline()
        for line in f:
            line = line.strip()
            if line:
                mrows.append(line.split(","))
    trk_by_t, _ = _read_tracks_csv(trk_path)
    n_track_rows = sum(len(v) for v in trk_by_t.values())
    try:
        meas_by_t: Dict[int, list] = {}
        for r in mrows:
            meas_by_t.setdefault(int(float(r[mix["t"]])), []).append(r)
    except (ValueError, IndexError) as e:
        raise jobs_lib.JobError(f"job {job.id}: malformed csv row: {e}")

    joined = []
    n_joined = 0
    try:
        for t, rows in sorted(meas_by_t.items()):
            cands = trk_by_t.get(t, [])
            if cands:
                dims_sl = slice(0, 3 if use_z else 2)
                pts = [
                    tuple(
                        float(r[mix[a]]) for a in
                        (("y", "x", "z") if use_z else ("y", "x"))
                    )
                    for r in rows
                ]
                assign = _match_centroids(
                    pts, [c[dims_sl] for c in cands], tol
                )
                ids = [cands[j][3] if j >= 0 else -1 for j in assign]
                n_joined += sum(j >= 0 for j in assign)
            else:
                ids = [-1] * len(rows)
            for r, tid in zip(rows, ids):
                joined.append((tid, t, r))
    except (ValueError, IndexError) as e:
        raise jobs_lib.JobError(f"job {job.id}: malformed csv row: {e}")
    if n_joined == 0 and mrows and n_track_rows:
        raise jobs_lib.JobError(
            "no measurement row joined any tracking row: run "
            "measure_objects and track_objects with MATCHING object "
            f"params (match_tol={tol})"
        )
    n_unjoined_track_rows = n_track_rows - n_joined
    if n_unjoined_track_rows:
        job.runtime_warnings.append(
            f"{n_unjoined_track_rows} tracking row(s) joined no "
            "measurement (frame_range subset, or object params differ "
            "between the two runs) — traces are PARTIAL for those tracks"
        )
    out_path = os.path.join(job.output, "traces.csv")
    with open(out_path + ".tmp", "w") as f:
        f.write("track_id," + ",".join(mcols) + "\n")
        # track -1 rows last; within a track, time order
        joined.sort(key=lambda v: (v[0] < 0, v[0], v[1]))
        for tid, _, r in joined:
            f.write(f"{tid}," + ",".join(r) + "\n")
    os.replace(out_path + ".tmp", out_path)
    metrics = {
        "n_rows": len(joined),
        "n_joined": n_joined,
        "n_unjoined": len(joined) - n_joined,
        "n_unjoined_track_rows": n_unjoined_track_rows,
        "n_tracks": len({tid for tid, _, _ in joined if tid >= 0}),
    }
    return {"traces": out_path, "metrics": json.dumps(metrics)}


@register("export_ctc")
def export_ctc(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Render a tracking run in Cell-Tracking-Challenge (CTC) format.

    The interop endpoint of the lineage story: CTC evaluation tools
    (TRA/SEG measures, lineage viewers) consume a RES folder of per-frame
    16-bit instance masks whose labels ARE the track labels, plus
    ``res_track.txt`` (the ``L B E P`` table ``track_objects`` already
    writes as lbep.txt). input: [labels entry, track_objects output dir]
    — the SAME labels stack the tracked objects.h5 was localized from,
    and the tracking run to render (chain both with ``depends_on``).

    Each frame's instances are re-derived with the same object semantics
    the serve used (``min_area``/``split_touching``/``min_distance`` must
    match it) and joined to the tracking rows by centroid (a KD-tree
    within ``match_tol``, default 0.1 px — centroids are stored at 3
    decimals, so genuine matches are exact). Matched pixels repaint to
    the CTC 1-based track label (``track_id + 1``, exactly the labels
    lbep.txt carries); instances with no tracking row (e.g. dropped by
    ``min_track_length``) paint background and count in ``n_unmatched``.

    Outputs: ``mask{t:0Nd}.tif`` one per frame (uint16, N = max(3,
    digits of T) — the CTC RES naming, 0-based WITHIN the export, so a
    ``frame_range`` subset is itself a valid contiguous RES folder) +
    ``res_track.txt`` (trimmed/shifted to the exported range; parents
    outside it clear to 0). Zero matches with tracking rows present is a
    deterministic JobError (the object params do not reproduce the
    serve); partially-unmatched rows surface as a runtime warning +
    ``n_unmatched_rows``. 2D only (CTC's own format is per-frame planar
    masks).
    """
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.data import tiff
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    if len(paths) != 2:
        raise jobs_lib.JobError(
            f"export_ctc needs [labels, tracking output dir], got "
            f"{len(paths)} input(s)"
        )
    lab_path, trk_path = paths
    if os.path.isdir(lab_path) and os.path.exists(
        os.path.join(lab_path, "tracks.csv")
    ):
        lab_path, trk_path = trk_path, lab_path  # argument-order slip
    tracks_csv = (
        os.path.join(trk_path, "tracks.csv")
        if os.path.isdir(trk_path) else trk_path
    )
    lbep_src = os.path.join(os.path.dirname(tracks_csv), "lbep.txt")
    if not os.path.exists(tracks_csv) or not os.path.exists(lbep_src):
        raise jobs_lib.JobError(
            f"{trk_path!r} is not a track_objects output (needs "
            "tracks.csv + lbep.txt)"
        )
    try:
        lsource = FrameSource(paths=[lab_path])
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read labels: {e}")
    try:
        lsource = _apply_frame_range(job, lsource)
        p = job.params
        try:
            min_area = int(p.get("min_area", 1))
            split_touching = bool(p.get("split_touching", False))
            instances = bool(p.get("instances", False))
            min_distance = int(p.get("min_distance", 5))
            tol = float(p.get("match_tol", 0.1))
        except (TypeError, ValueError) as e:
            raise jobs_lib.JobError(f"job {job.id}: bad param: {e}")
        if tol <= 0:
            raise jobs_lib.JobError(f"match_tol must be > 0, got {tol}")
        _check_instances_params(instances, split_touching)
        by_t, max_tid = _read_tracks_csv(tracks_csv)
        if max_tid + 1 > 65535:
            raise jobs_lib.JobError(
                f"{max_tid + 1} CTC labels exceed uint16 (65535 max)"
            )
    except BaseException:
        lsource.close()
        raise

    timer = PhaseTimer()
    n_frames = len(lsource)
    start = lsource.frame_offset
    # CTC folders are 0-based and contiguous: a frame_range export
    # renumbers its masks from 0 and rewrites res_track to the subrange
    # (a wholesale lbep copy would reference frames with no mask file —
    # an invalid RES folder; code-review finding)
    width = max(3, len(str(n_frames - 1)))
    rep = jobs_lib.ProgressReporter(job, n_frames)
    n_matched = n_unmatched = n_unmatched_rows = 0
    t0 = time.time()
    comp = _out_compression(job)
    with lsource:
        for t in range(n_frames):
            t_abs = t + start
            with timer.phase("read"):
                lab = _frame_or_fail(job, lsource, t)
            with timer.phase("relabel"):
                inst, n, areas, classes, keep, cy, cx = _derive_objects(
                    lab, split_touching, min_distance, min_area,
                    instances=instances,
                )
                lut = np.zeros(n + 1, np.uint16)
                rows = by_t.get(t_abs, [])
                kept = np.flatnonzero(keep) if n else np.zeros(0, int)
                got = 0
                if len(kept) and rows:
                    # gated ONE-TO-ONE assignment (shared helper): a
                    # per-instance nearest query would double-book a row
                    # when two instances share a centroid (ring + center
                    # fragment), painting one track label twice and the
                    # other never
                    assign = _match_centroids(
                        np.stack([cy[kept], cx[kept]], axis=1),
                        [(r[0], r[1]) for r in rows], tol,
                    )
                    for i, j in zip(kept, assign):
                        if j >= 0:
                            lut[i + 1] = rows[j][3] + 1  # CTC 1-based
                            got += 1
                    n_unmatched_rows += len(rows) - got
                else:
                    n_unmatched_rows += len(rows)
                n_matched += got
                n_unmatched += len(kept) - got
                mask = lut[inst]
            with timer.phase("write"):
                pth = os.path.join(job.output, f"mask{t:0{width}d}.tif")
                tiff.write_stack(pth, mask[None], compression=comp)
            rep.step()
    if n_matched == 0 and by_t:
        # every tracking row missed every instance: the object semantics
        # (min_area/split_touching/min_distance) do not match the serve
        # the tracking was computed from — deterministic, fail loudly
        raise jobs_lib.JobError(
            "no tracking row matched any instance: object-derivation "
            "params must MATCH the serve the tracking consumed "
            f"(min_area={min_area}, split_touching={split_touching}, "
            f"min_distance={min_distance}, match_tol={tol})"
        )
    if n_unmatched_rows:
        job.runtime_warnings.append(
            f"{n_unmatched_rows} tracking row(s) matched no instance "
            "(frame_range subset, or object params differ from the serve)"
        )
    res_path = os.path.join(job.output, "res_track.txt")
    stop = start + n_frames
    with open(lbep_src) as f, open(res_path + ".tmp", "w") as out_f:
        kept_labels = set()
        rows_lbep = []
        for line in f:
            parts = line.split()
            if len(parts) != 4:
                continue
            lbl, b, e, par = (int(v) for v in parts)
            if e < start or b >= stop:
                continue  # entirely outside the exported range
            rows_lbep.append(
                (lbl, max(b - start, 0), min(e, stop - 1) - start, par)
            )
            kept_labels.add(lbl)
        for lbl, b, e, par in rows_lbep:
            out_f.write(
                f"{lbl} {b} {e} {par if par in kept_labels else 0}\n"
            )
    os.replace(res_path + ".tmp", res_path)
    rep.finish()
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_frames=n_frames, n_matched=n_matched, n_unmatched=n_unmatched,
        n_unmatched_rows=n_unmatched_rows,
    )
    return {
        "masks": os.path.join(job.output, "mask*.tif"),
        "res_track": res_path,
        "metrics": json.dumps(metrics),
    }


def _parse_qc_params(job: Job):
    """Shared qc_stack threshold parsing/validation (2D and 3D paths must
    not drift): returns (sat_param, mad_k, focus_drop, dark_fraction,
    sat_max); malformed or out-of-range values are deterministic
    JobErrors."""
    p = job.params
    try:
        sat_param = p.get("saturation_level")
        sat_param = None if sat_param is None else float(sat_param)
        mad_k = float(p.get("focus_mad_k", 3.5))
        focus_drop = float(p.get("focus_drop", 0.5))
        dark_fraction = float(p.get("dark_fraction", 0.5))
        sat_max = float(p.get("saturation_max", 0.01))
    except (TypeError, ValueError) as e:
        # bad params are deterministic: fail fast, never retry
        raise jobs_lib.JobError(f"job {job.id}: bad qc param: {e}")
    if (
        mad_k <= 0 or not 0 <= dark_fraction < 1
        or not 0 < sat_max <= 1 or not 0 < focus_drop <= 1
    ):
        raise jobs_lib.JobError(
            f"bad thresholds: focus_mad_k={mad_k} (>0), focus_drop="
            f"{focus_drop} ((0,1]), dark_fraction={dark_fraction} "
            f"([0,1)), saturation_max={sat_max} ((0,1])"
        )
    return sat_param, mad_k, focus_drop, dark_fraction, sat_max


def _qc_stack_3d(job: Job, paths) -> Dict[str, str]:
    """Volumetric ``qc_stack`` (``dims: 3``): per-plane QC + per-volume
    focal-drift flags for timelapses of z-stacks.

    Per timepoint, every z-plane scores through the same fused QC graph
    (vmapped over z — one dispatch per volume). Two outputs:

    * ``qc.csv`` — one row per (t, channel, z): the plane metrics, for
      drilling into any flagged volume;
    * ``qc_volumes.csv`` — one row per (t, channel): ``best_z`` (the
      sharpest plane — its drift over time IS the focal-creep signal
      ``register_stack dims: 3`` corrects), the best plane's focus
      scores, volume-wide mean/sat_frac, and the run-relative flags
      (the same focus/dark/saturated rules applied to the per-volume
      aggregates — a volume whose BEST plane went soft is out of focus
      everywhere).

    Metrics add ``best_z_drift`` (max |best_z - median best_z| per
    channel, in planes): a nonzero drift with clean flags means the
    sample is walking in z and registration should run first.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.ops import qc as qc_lib
    from sequitr_tpu.pipeline import infer as infer_lib
    from sequitr_tpu.utils import PhaseTimer

    p = job.params
    z_pages = _parse_z_pages(job)
    sources = []
    try:
        for p_ in paths:
            try:
                sources.append(VolumeSequence(p_, z=z_pages))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        sources = [_apply_frame_range(job, s) for s in sources]
        if len({(len(s), s.spatial) for s in sources}) != 1:
            raise jobs_lib.JobError(
                "channels disagree in length/shape: "
                + str([(len(s), s.spatial) for s in sources])
            )
        (sat_param, mad_k, focus_drop, dark_fraction,
         sat_max) = _parse_qc_params(job)
    except BaseException:
        for s in sources:
            s.close()
        raise

    timer = PhaseTimer()
    t0 = time.time()
    n_vols = len(sources[0])
    offset = sources[0].frame_offset
    qc_vol = qc_lib.cached_volume_qc()
    rep = jobs_lib.ProgressReporter(job, n_vols * len(sources))
    plane_tables = []  # per channel: (T, Z, 7)
    i_focus = qc_lib.METRICS.index("focus_vol")
    i_mean = qc_lib.METRICS.index("mean")
    i_sat = qc_lib.METRICS.index("sat_frac")
    try:
        for ch, src in enumerate(sources):
            sat = (
                sat_param if sat_param is not None
                else qc_lib.default_saturation_level(src.dtype)
            )
            sat_j = jnp.asarray(
                np.inf if sat is None else sat, jnp.float32
            )
            rows = []
            for out in infer_lib.stream_frames(
                lambda v: qc_vol(v, sat_j),
                _reads_fail_fast(
                    job, (src.volume(t) for t in range(n_vols))
                ),
                prefetch_host=infer_lib._copy_to_host_async,
            ):
                with timer.phase("fetch"):
                    rows.append(np.asarray(out))
                rep.step()
            plane_tables.append(
                np.stack(rows)
                if rows else np.zeros((0, 1, len(qc_lib.METRICS)))
            )
    finally:
        for s in sources:
            s.close()
    with timer.phase("flag"):
        vol_tables, best_zs, flags = [], [], []
        for tb in plane_tables:  # (T, Z, 7)
            bz = np.argmax(tb[:, :, i_focus], axis=1)
            vt = tb[np.arange(len(tb)), bz].copy()  # best plane's row
            vt[:, i_mean] = tb[:, :, i_mean].mean(axis=1)
            # saturation is ABSOLUTE (ops/qc.py): a single laser-spiked
            # plane must flag the volume — a Z-mean would dilute it
            # below the threshold (review finding)
            vt[:, i_sat] = tb[:, :, i_sat].max(axis=1)
            vol_tables.append(vt)
            best_zs.append(bz)
            flags.append(qc_lib.flag_frames(
                vt, mad_k=mad_k, dark_fraction=dark_fraction,
                sat_max=sat_max, focus_drop=focus_drop,
            ))
    qc_path = os.path.join(job.output, "qc.csv")
    with open(qc_path + ".tmp", "w") as f:
        f.write("t,channel,z," + ",".join(qc_lib.METRICS) + "\n")
        for t in range(n_vols):
            for ch, tb in enumerate(plane_tables):
                for z in range(tb.shape[1]):
                    vals = ",".join(f"{v:.6g}" for v in tb[t, z])
                    f.write(f"{t + offset},{ch},{z},{vals}\n")
    os.replace(qc_path + ".tmp", qc_path)
    volumes_path = os.path.join(job.output, "qc_volumes.csv")
    with open(volumes_path + ".tmp", "w") as f:
        f.write(
            "t,channel,best_z," + ",".join(qc_lib.METRICS) + ",flags\n"
        )
        for t in range(n_vols):
            for ch in range(len(sources)):
                vals = ",".join(f"{v:.6g}" for v in vol_tables[ch][t])
                f.write(
                    f"{t + offset},{ch},{int(best_zs[ch][t])},{vals},"
                    f"{'+'.join(flags[ch][t])}\n"
                )
    os.replace(volumes_path + ".tmp", volumes_path)
    rep.finish()
    per_flag: Dict[str, int] = {}
    flagged = set()
    drift = 0.0
    for ch in range(len(sources)):
        if len(best_zs[ch]):
            med = float(np.median(best_zs[ch]))
            # float deviation: int() truncated a genuine one-plane shift
            # to 0 when an even-length run put the median at x.5
            drift = max(
                drift, round(float(np.abs(best_zs[ch] - med).max()), 1)
            )
        for t, fl in enumerate(flags[ch]):
            if fl:
                flagged.add(t)
            for name in fl:
                per_flag[name] = per_flag.get(name, 0) + 1
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_frames=n_vols, n_channels=len(sources),
        n_flagged_volumes=len(flagged), best_z_drift=drift,
        **{f"n_{k}": v for k, v in sorted(per_flag.items())},
    )
    return {
        "qc": qc_path,
        "qc_volumes": volumes_path,
        "metrics": json.dumps(metrics),
    }


@register("qc_stack")
def qc_stack(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Per-frame acquisition QC of a timelapse (no model required).

    The triage step BEFORE chip time is spent: scores every frame's
    focus (Laplacian variance + Tenengrad), exposure (mean/std/p01/p99)
    and saturation fraction in one fused on-device graph per frame
    (``ops/qc.py``), then flags outliers with run-relative robust
    statistics — ``focus`` (score ``focus_mad_k`` robust sigmas below
    the run median), ``dark`` (mean under ``dark_fraction`` x the run
    median) and ``saturated`` (fraction over ``saturation_max``). Feed
    the flagged frame list to ``frame_range``/pre-filtering before
    training or serving. An extension beyond the reference's capability
    list (its era triaged by eye).

    input: one or more channel entries (the shared one-TIFF-per-channel
    convention; each channel scores and flags independently). params:
    ``saturation_level`` (absolute; default = the integer dtype's
    full-scale value, float inputs skip saturation unless given),
    ``focus_mad_k`` (default 3.5), ``focus_drop`` (default 0.5 — a
    focus flag also requires the score under this fraction of the run
    median), ``dark_fraction`` (default 0.5), ``saturation_max``
    (default 0.01), ``frame_range``. ``dims: 3`` runs the volumetric
    variant (``_qc_stack_3d``: per-plane rows + per-volume flags +
    ``best_z`` focal-drift tracking over the shared volume-timelapse
    input conventions).

    Outputs: qc.csv — one row per (frame, channel):
    ``t,channel,focus_vol,tenengrad,mean,std,p01,p99,sat_frac,flags``
    (``flags`` is ``+``-joined, empty = clean). Metrics: n_frames,
    n_flagged and per-flag counts.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import qc as qc_lib
    from sequitr_tpu.pipeline import infer as infer_lib
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    p = job.params
    try:
        dims = int(p.get("dims", 2))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(f"dims={p.get('dims')!r} must be 2 or 3")
    if dims == 3:
        return _qc_stack_3d(job, paths)
    if dims != 2:
        raise jobs_lib.JobError(f"dims={dims} must be 2 or 3")
    sources = []
    try:
        for p_ in paths:
            try:
                sources.append(FrameSource(paths=[p_]))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        sources = [_apply_frame_range(job, s) for s in sources]
        if len({(len(s), s.spatial) for s in sources}) != 1:
            raise jobs_lib.JobError(
                "channels disagree in length/shape: "
                + str([(len(s), s.spatial) for s in sources])
            )
        (sat_param, mad_k, focus_drop, dark_fraction,
         sat_max) = _parse_qc_params(job)
    except BaseException:
        for s in sources:
            s.close()
        raise

    timer = PhaseTimer()
    n_frames = len(sources[0])
    offset = sources[0].frame_offset
    qc_fn = qc_lib.cached_frame_qc()
    rep = jobs_lib.ProgressReporter(job, n_frames * len(sources))
    tables = []  # per-channel (T, 7)
    t0 = time.time()
    try:
        for ch, src in enumerate(sources):
            sat = (
                sat_param if sat_param is not None
                else qc_lib.default_saturation_level(src.dtype)
            )
            sat_j = jnp.asarray(np.inf if sat is None else sat, jnp.float32)
            rows = []
            with src:
                for out in infer_lib.stream_frames(
                    lambda f: qc_fn(f, sat_j),
                    _reads_fail_fast(
                        job, (src.frame(t) for t in range(n_frames))
                    ),
                    prefetch_host=infer_lib._copy_to_host_async,
                ):
                    with timer.phase("fetch"):
                        rows.append(np.asarray(out))
                    rep.step()
            tables.append(np.stack(rows) if rows else np.zeros((0, 7)))
    finally:
        # a mid-stream failure in channel k must not leak the remaining
        # channels' open readers in a long-lived worker (close is
        # idempotent; the with-block already closed the current one)
        for s in sources:
            s.close()
    with timer.phase("flag"):
        flags = [
            qc_lib.flag_frames(
                tb, mad_k=mad_k, dark_fraction=dark_fraction,
                sat_max=sat_max, focus_drop=focus_drop,
            )
            for tb in tables
        ]
    qc_path = os.path.join(job.output, "qc.csv")
    with open(qc_path + ".tmp", "w") as f:
        f.write("t,channel," + ",".join(qc_lib.METRICS) + ",flags\n")
        for t in range(n_frames):
            for ch in range(len(sources)):
                vals = ",".join(f"{v:.6g}" for v in tables[ch][t])
                f.write(
                    f"{t + offset},{ch},{vals},"
                    f"{'+'.join(flags[ch][t])}\n"
                )
    os.replace(qc_path + ".tmp", qc_path)
    rep.finish()
    per_flag: Dict[str, int] = {}
    flagged = set()
    for ch in range(len(sources)):
        for t, fl in enumerate(flags[ch]):
            if fl:
                flagged.add(t)
            for name in fl:
                per_flag[name] = per_flag.get(name, 0) + 1
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_frames=n_frames, n_channels=len(sources),
        n_flagged_frames=len(flagged),
        **{f"n_{k}": v for k, v in sorted(per_flag.items())},
    )
    return {"qc": qc_path, "metrics": json.dumps(metrics)}


@register("project_stack")
def project_stack_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Z-project a volume timelapse into a 2D timelapse.

    The bridge from volumetric acquisitions to the whole 2D pipeline
    family: project each timepoint's z-stack to one frame
    (``ops/projection.py`` — one fused jit graph per volume, timepoints
    streamed with H2D overlap) and chain segmentation / denoising /
    tracking / quantification on the projection via ``depends_on``. An
    extension beyond the reference's capability list (its era projected
    host-side in ImageJ before submitting jobs).

    input: one or more channel entries over the shared volume-timelapse
    conventions (directory/glob = one z-stack file per timepoint, or a
    single T·Z-page file with ``z`` pages per volume; a bare single
    file is a one-volume sequence). params: ``method`` (default
    ``"max"``: max / min / sum / mean / std / median / best_focus /
    edof), ``z`` (pages per volume), ``z_range: [lo, hi]`` (project
    planes lo..hi-1 only), ``edof_radius`` (local sharpness window
    half-width, default 4), ``edof_gamma`` (weighting exponent, default
    4.0), ``edof_mode`` (``"blend"`` smooth / ``"select"`` hard argmax),
    ``save_height`` (edof only: also write the per-pixel argmax-z
    height map), ``frame_range``, ``compress_output``.

    Outputs: projected.tif (single channel) or projected_c{k}.tif —
    selection methods (max/min/best_focus) keep the input dtype
    bit-exactly, arithmetic ones (sum/mean/std/median/edof) write
    float32; projection.csv (``t,channel,best_z`` — best_focus only);
    height.tif / height_c{k}.tif (uint16). Metrics: n_frames,
    n_channels, method, per-phase timings.
    """
    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.ops import projection as proj_lib
    from sequitr_tpu.pipeline import infer as infer_lib
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
    p = job.params
    method = str(p.get("method", "max"))
    try:
        project = proj_lib.cached_projector(
            method,
            radius=int(p.get("edof_radius", 4)),
            gamma=float(p.get("edof_gamma", 4.0)),
            mode=str(p.get("edof_mode", "blend")),
        )
    except (TypeError, ValueError) as e:
        raise jobs_lib.JobError(f"job {job.id}: {e}")
    save_height = bool(p.get("save_height", False))
    if save_height and method != "edof":
        raise jobs_lib.JobError(
            f"save_height requires method: 'edof' (got {method!r} — "
            "only EDoF produces a per-pixel height map)"
        )
    z_range = p.get("z_range")
    if z_range is not None:
        try:
            z_lo, z_hi = (int(v) for v in z_range)
        except (TypeError, ValueError):
            raise jobs_lib.JobError(
                f"z_range={z_range!r} must be [lo, hi] plane indices"
            )
        if not 0 <= z_lo < z_hi:
            raise jobs_lib.JobError(
                f"z_range=[{z_lo}, {z_hi}] must satisfy 0 <= lo < hi"
            )
    z_pages = _parse_z_pages(job)
    sources = []
    try:
        for p_ in paths:
            try:
                sources.append(VolumeSequence(p_, z=z_pages))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        sources = [_apply_frame_range(job, s) for s in sources]
        if len({(len(s), s.spatial) for s in sources}) != 1:
            raise jobs_lib.JobError(
                "channels disagree in length/shape: "
                + str([(len(s), s.spatial) for s in sources])
            )
        n_planes = sources[0].spatial[0]
        if z_range is not None and z_hi > n_planes:
            raise jobs_lib.JobError(
                f"z_range=[{z_lo}, {z_hi}] exceeds the volumes' "
                f"{n_planes} planes"
            )
        if z_range is None:
            z_lo, z_hi = 0, n_planes
    except BaseException:
        for s in sources:
            s.close()
        raise

    timer = PhaseTimer()
    t0 = time.time()
    n_vols = len(sources[0])
    offset = sources[0].frame_offset
    compression = _out_compression(job)
    keeps_dtype = proj_lib.METHODS[method]
    rep = jobs_lib.ProgressReporter(job, n_vols * len(sources))
    best_rows = []  # (t, channel, best_z) rows for best_focus

    def _prefetch(out) -> None:
        infer_lib._copy_to_host_async(out[0])
        if method in ("best_focus", "edof"):
            infer_lib._copy_to_host_async(out[1])

    outputs: Dict[str, str] = {}
    try:
        for ch, src in enumerate(sources):
            one = len(sources) == 1
            out_path = os.path.join(
                job.output,
                "projected.tif" if one else f"projected_c{ch}.tif",
            )
            out_dtype = np.dtype(src.dtype if keeps_dtype else np.float32)
            _, h, w = src.spatial
            est = float(n_vols) * h * w * out_dtype.itemsize
            writer = _append_writer(out_path, est, compression)
            hwriter = None
            if save_height:
                h_path = os.path.join(
                    job.output,
                    "height.tif" if one else f"height_c{ch}.tif",
                )
                hwriter = _append_writer(h_path, est, compression)

            def volumes(src=src):
                for t in range(n_vols):
                    yield src.volume(t)[z_lo:z_hi]

            t_idx = 0
            with src, writer:
                try:
                    for proj, aux in infer_lib.stream_frames(
                        project,
                        _reads_fail_fast(job, volumes()),
                        prefetch_host=_prefetch,
                    ):
                        with timer.phase("write"):
                            writer.append(
                                np.asarray(proj).astype(
                                    out_dtype, copy=False
                                )
                            )
                            if method == "best_focus":
                                # best_z is relative to z_range's origin
                                best_rows.append((
                                    t_idx + offset, ch,
                                    int(np.asarray(aux)) + z_lo,
                                ))
                            if hwriter is not None:
                                hwriter.append(
                                    (np.asarray(aux) + z_lo).astype(
                                        np.uint16
                                    )
                                )
                        rep.step()
                        t_idx += 1
                except BaseException:
                    # discard the partial height file too (the main
                    # writer's own __exit__ aborts); close() would
                    # COMMIT a truncated stack into place
                    if hwriter is not None:
                        hwriter.abort()
                    raise
                if hwriter is not None:
                    hwriter.close()
            outputs["projected" if one else f"projected_c{ch}"] = out_path
            if save_height:
                outputs["height" if one else f"height_c{ch}"] = h_path
    finally:
        for s in sources:
            s.close()
    if method == "best_focus":
        csv_path = os.path.join(job.output, "projection.csv")
        with open(csv_path + ".tmp", "w") as f:
            f.write("t,channel,best_z\n")
            for t, ch, z in sorted(best_rows):
                f.write(f"{t},{ch},{z}\n")
        os.replace(csv_path + ".tmp", csv_path)
        outputs["projection"] = csv_path
    rep.finish()
    metrics = dict(
        timer.summary(), total_s=round(time.time() - t0, 4),
        n_frames=n_vols, n_channels=len(sources), method=method,
    )
    outputs["metrics"] = json.dumps(metrics)
    return outputs


@register("track_objects")
def track_objects(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Link a serve's ``objects.h5`` into trajectories (tracks.csv).

    A BUILT-IN linker (globally-optimal gated Hungarian assignment per
    frame pair, short-gap closing — ``sequitr_tpu.tracking``) for QC,
    motility statistics and emitter trajectories. The objects file stays
    btrack-compatible; btrack remains the supported path for
    publication-grade Bayesian tracking. This pipeline is an extension
    beyond the reference's capability list (SURVEY.md §0: sequitr
    delegates ALL tracking to btrack).

    input: [objects.h5] (a segmentation/emitter serve's output). params:
    ``max_distance`` (linking gate in pixels, default 20), ``max_gap``
    (frames a track may go undetected, default 0), ``obj_type`` (h5 group,
    default 1), ``min_track_length`` (drop shorter tracks from the CSV,
    default 1; survivors are compactly relabelled and re-rooted so the
    outputs stay a self-consistent forest with CTC-contiguous labels —
    an orphaned child becomes a generation-0 root).

    ``motion_model: "kalman"`` switches to a constant-velocity Kalman
    filter per track with Mahalanobis gating (``gate_sigma``, default 4;
    ``process_noise`` accel std px/frame^2; ``measurement_noise`` px;
    ``init_velocity_noise`` px/frame) — crossings disambiguated by each
    track's own motion history, gaps closed by prediction. ``divisions:
    true`` resolves binary fission into parent/child lineages
    (``division_distance`` gate, default ``max_distance``;
    ``mitotic_class`` restricts dividing parents to tracks whose last
    detection carries that semantic class — wire it to the classifier
    the serve already ran). Outputs: tracks.csv, track_summaries.csv
    (with parent_id/root_id/generation columns) and lbep.txt
    (Cell-Tracking-Challenge ``L B E P`` lineage table, 1-based labels,
    parent 0 = none) (+ metrics: n_tracks, n_links, n_divisions,
    mean/max track length).
    """
    from sequitr_tpu import localize as loc_lib
    from sequitr_tpu import tracking

    paths = _resolve_inputs(job)
    if len(paths) != 1:
        raise jobs_lib.JobError("track_objects needs exactly one objects.h5")
    p = job.params
    try:
        tables = loc_lib.read_objects_h5(
            paths[0], obj_type=int(p.get("obj_type", 1))
        )
    except (OSError, KeyError, ValueError, TypeError) as e:
        # any malformed file/params is deterministic: fail fast, no retry
        raise jobs_lib.JobError(f"job {job.id}: cannot read objects: {e!r}")
    mit = p.get("mitotic_class")
    try:
        track_ids, tracks = tracking.link_tables(
            tables,
            max_distance=float(p.get("max_distance", 20.0)),
            max_gap=int(p.get("max_gap", 0)),
            motion_model=str(p.get("motion_model", "nearest")),
            gate_sigma=float(p.get("gate_sigma", 4.0)),
            process_noise=float(p.get("process_noise", 1.0)),
            measurement_noise=float(p.get("measurement_noise", 1.0)),
            init_velocity_noise=(
                None if p.get("init_velocity_noise") is None
                else float(p["init_velocity_noise"])
            ),
            divisions=bool(p.get("divisions", False)),
            division_distance=(
                None if p.get("division_distance") is None
                else float(p["division_distance"])
            ),
            mitotic_class=None if mit is None else int(mit),
        )
    except (ValueError, TypeError) as e:
        raise jobs_lib.JobError(f"job {job.id}: {e}")
    min_len = int(p.get("min_track_length", 1))
    if min_len > 1:
        keep = np.fromiter(
            (t.track_id for t in tracks if t.n_points >= min_len), np.int32
        )
        masks = [np.isin(ids, keep) for ids in track_ids]
        # drop filtered detections from the CSVs entirely
        tables = [
            loc_lib.FrameTable(
                coords=tb.coords[m],
                area=tb.area[m],
                intensity_mean=tb.intensity_mean[m],
            )
            for tb, m in zip(tables, masks)
        ]
        track_ids = [ids[m] for ids, m in zip(track_ids, masks)]
        keep_set = set(int(k) for k in keep)
        tracks = [t for t in tracks if t.track_id in keep_set]
        # compact relabel + re-root so every output stays a
        # self-consistent forest with CTC-contiguous labels (an orphaned
        # child becomes a generation-0 root; filters do not cascade)
        tracks, remap = tracking.reindex_lineage(tracks)
        track_ids = [
            np.fromiter((remap[int(i)] for i in ids), np.int32, len(ids))
            for ids in track_ids
        ]
    csv_path = os.path.join(job.output, "tracks.csv")
    n_rows = tracking.write_tracks_csv(csv_path, tables, track_ids)
    sum_path = os.path.join(job.output, "track_summaries.csv")
    tracking.write_track_summaries_csv(sum_path, tracks)
    lbep_path = os.path.join(job.output, "lbep.txt")
    tracking.write_lbep(lbep_path, tracks)
    lens = [t.n_points for t in tracks] or [0]
    parents = {t.parent_id for t in tracks if t.parent_id >= 0}
    metrics = {
        "n_tracks": len(tracks),
        # links actually MADE (frame-to-frame assignments) vs detections
        # written: a gate too tight shows n_links 0 even with many rows
        "n_links": int(sum(t.n_links for t in tracks)),
        "n_detections": n_rows,
        "n_frames": len(tables),
        "n_divisions": len(parents),
        "mean_track_len": round(float(np.mean(lens)), 2),
        "max_track_len": int(np.max(lens)),
    }
    return {
        "tracks": csv_path,
        "track_summaries": sum_path,
        "lbep": lbep_path,
        "metrics": json.dumps(metrics),
    }


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


@register("register_stack")
def register_stack_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Drift-correct a timelapse by FFT phase correlation (no model).

    Exposes ``ops.registration`` through the job API: stage drift is
    estimated frame-to-frame (or against the first frame), integrated,
    and each frame is resampled back onto a stationary field of view —
    the per-frame estimate+resample step is one fused jit graph whose
    FFTs ride the MXU (registration.py design notes). params:

    * ``mode``: ``"previous"`` (default) — frame-to-frame steps integrate
      into the drift trajectory (robust when the scene evolves slowly);
      ``"first"`` — every frame correlates against the stack's first
      frame (no error accumulation; needs a persistent scene).
    * ``subpixel`` (default true): Fourier-shift resample (float32
      output); false = integer ``roll`` — lossless, output keeps the
      input dtype (use for label stacks).
    * ``window`` (default true): Hann window before correlation.
    * ``refine`` (default 2): correlation passes per estimate — pass 2+
      re-correlates after shifting the frame back by the running
      estimate, collapsing the window-induced bias (measured ~10x per
      pass; registration.py module docstring). 1 = classic single-pass.
    * ``crop`` (default false): write only the common field of view
      (two passes: estimate, then apply+crop) instead of full frames
      with wrapped borders.
    * ``estimate_only`` (default false): write shifts.csv only.
    * ``frame_range``: [start, stop) as in the serving pipelines.
    * ``data_parallel`` (default false): shard frames over all chips of
      the mesh. ``first`` mode only — every frame correlates against the
      same reference, so estimation (and the fused resample for
      single-channel sub-pixel serves) is embarrassingly parallel, one
      batched dispatch per device-count chunk with zero inter-chip
      traffic. ``previous`` mode integrates an anchor chain serially and
      rejects the flag. 2D only (volume sequences are few-timepoint).
    * ``estimate_roi`` ([y0, x0, y1, x1], 2D only): estimate the drift
      from a STABLE SUBREGION (fiducial marks, adherent patch) instead
      of the whole frame — estimation FFTs shrink to the ROI while the
      trajectory resamples FULL frames. Per-frame motion beyond half
      the ROI is unrecoverable (the mod-N period follows the
      estimation window).
    * ``frame_batch`` (default 1): frames per dispatch in ``first``
      mode — batches the correlation (and fused resample) to amortize
      per-dispatch overhead on small frames; composes with
      ``data_parallel`` (each chip gets ``frame_batch`` frames per
      chunk). Output identical to streaming; ``previous`` mode rejects
      it (serial anchor chain).
    * ``dims`` (default 2): 3 = VOLUMETRIC registration of a timelapse of
      z-stacks — one multi-page TIFF per timepoint (directory/glob entry,
      natural sort), one (dz, dy, dx) estimate per volume in a single 3D
      correlation (axial focus creep included, which per-plane 2D
      registration cannot see); outputs per-timepoint
      ``registered_t{t:04d}[_c{k}].tif`` volumes and a dz/dy/dx
      shifts.csv.
    * ``z`` (dims=3 only): pages per volume for the SINGLE-FILE
      convention — one TIFF of T·Z pages (flattened hyperstack);
      timepoint t is pages [t·z, (t+1)·z), read lazily. Outputs stay
      per-timepoint files.

    * ``min_response`` (default 0 = off): confidence gate on the
      correlation peak-to-sidelobe ratio — estimates below it (blank
      frames, shutter drops, focus jumps; a healthy lock measures >~10,
      unrelated content ~5) are REJECTED: the trajectory holds at the
      last accepted shift and, in ``previous`` mode, the anchor is NOT
      re-anchored onto the bad frame, so one corrupt frame cannot derail
      the rest of the stack. Rejections stay visible (their low response
      in shifts.csv; ``n_low_confidence`` in the metrics).
    * ``align_channels`` (default false): also correct the STATIC
      inter-channel offset (chromatic aberration / dual-camera
      registration) — channel k's shift vs channel 0 is estimated as the
      median over sampled frames (<=5 in 2D; <=3 volumes in dims=3,
      where the offset is a full (dz, dy, dx) — axial chromatic shift
      included) and folded into every frame's resample (and the crop
      bounds); offsets land in the metrics. In integer mode
      (``subpixel: false``) the offsets are quantized to whole pixels
      (the roll is lossless; a sub-pixel remainder cannot be) — the
      reported offset is always the APPLIED one.

    Multi-channel (one TIFF per input entry): shifts are estimated on the
    FIRST channel and applied to every channel. Outputs:
    ``registered.tif`` (single channel) or ``registered_c{k}.tif``,
    ``shifts.csv`` (frame, dy, dx, step_dy, step_dx, response — dy/dx are
    the cumulative physical drift correction, mod-N unwrapped
    (``registration.unwrap_trajectory``; the applied wrap-resample is
    unaffected by unwrapping); response is the correlation
    peak-to-sidelobe ratio, low = unreliable lock), and drift metrics.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.ops import registration as reg_lib
    from sequitr_tpu.utils import PhaseTimer

    p = job.params
    mode = p.get("mode", "previous")
    if mode not in ("previous", "first"):
        raise jobs_lib.JobError(
            f"mode={mode!r} must be 'previous' or 'first'"
        )
    subpixel = bool(p.get("subpixel", True))
    window = bool(p.get("window", True))
    refine = int(p.get("refine", 2))
    if not 1 <= refine <= 8:
        raise jobs_lib.JobError(f"refine={refine} must be in [1, 8]")
    crop = bool(p.get("crop", False))
    estimate_only = bool(p.get("estimate_only", False))
    try:
        min_response = float(p.get("min_response", 0.0))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"min_response={p.get('min_response')!r} must be a number"
        )
    if not 0.0 <= min_response < float("inf"):  # also catches NaN
        raise jobs_lib.JobError(
            f"min_response={min_response!r} must be a finite number >= 0"
        )
    dims = int(p.get("dims", 2))
    dp_param = bool(p.get("data_parallel"))
    if dims == 3:
        if dp_param:
            raise jobs_lib.JobError(
                "data_parallel registration is 2D-only (volume sequences "
                "are few-timepoint; shifts ride channel 0 serially)"
            )
        if p.get("estimate_roi") is not None:
            raise jobs_lib.JobError(
                "estimate_roi registration is 2D-only"
            )
        try:
            fb3 = int(p.get("frame_batch", 1) or 1)
        except (TypeError, ValueError):
            fb3 = 2  # garbage: reject via the same deterministic path
        if fb3 > 1:
            raise jobs_lib.JobError(
                "frame_batch registration is 2D-only (volume sequences "
                "are few-timepoint; one 3D correlation per dispatch)"
            )
        z = _parse_z_pages(job)
        return _register_volumes(
            job, mode, subpixel, window, refine, crop, estimate_only,
            z=z, min_response=min_response,
            align_channels=bool(p.get("align_channels", False)),
        )
    if dims != 2:
        raise jobs_lib.JobError(f"dims={dims} must be 2 or 3")
    if p.get("roi") is not None:
        raise jobs_lib.JobError(
            "register_stack takes estimate_roi (drift from a stable "
            "subregion; FULL frames are resampled), not roi"
        )
    if dp_param and mode != "first":
        raise jobs_lib.JobError(
            "data_parallel registration needs mode='first': 'previous' "
            "mode integrates a frame-to-frame anchor chain, which is "
            "inherently serial"
        )
    try:
        frame_batch = int(p.get("frame_batch", 1))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"frame_batch={p.get('frame_batch')!r} must be an integer"
        )
    if not 1 <= frame_batch <= 256:
        raise jobs_lib.JobError(
            f"frame_batch={frame_batch} must be in [1, 256]"
        )
    if frame_batch > 1 and mode != "first":
        raise jobs_lib.JobError(
            "frame_batch needs mode='first': 'previous' mode integrates "
            "a frame-to-frame anchor chain, which is inherently serial"
        )
    import jax as _jax

    use_dp = dp_param and _jax.device_count() > 1
    use_batch = use_dp or frame_batch > 1
    est_roi = p.get("estimate_roi")
    if est_roi is not None:
        est_roi = _parse_roi_values(est_roi, "estimate_roi")
    reject_stats = {"n": 0}  # min_response rejections (2D estimators)

    paths = _resolve_inputs(job)
    try:
        source = FrameSource(paths=paths)
    except ValueError as e:
        raise jobs_lib.JobError(f"job {job.id}: cannot read inputs: {e}")
    source = _apply_frame_range(job, source)
    n_frames = len(source)
    h, w = source.spatial
    timer = PhaseTimer()
    t0 = time.time()

    def estimate_frames(src, resample):
        """Per-frame (frame, cum, step, resp, corrected) via the fused
        step. ``src`` yields (H, W) or (H, W, C) frames; shifts are
        estimated on channel 0. ``resample=True`` additionally returns
        the fused on-device resample of channel 0 (None otherwise, and
        its inverse FFT never enters the graph).

        ``min_response`` confidence gate: an estimate whose PSR falls
        below it (blank frame, shutter drop, focus jump) is REJECTED —
        the trajectory holds at the last accepted shift, the anchor is
        NOT re-anchored onto the bad frame (one corrupt frame must not
        derail the rest of the stack), and the fused resample is
        discarded (the consumer re-applies the held shift)."""
        anchor = None
        cum = jnp.zeros(2, jnp.float32)
        zero = jnp.zeros(2, jnp.float32)
        held = np.zeros(2, np.float32)
        for frame in src.frames():
            ch0 = frame[..., 0] if frame.ndim == 3 else frame
            if anchor is None:
                # window sized from the frames actually served (an
                # estimate_roi source streams ROI-sized frames)
                win = (
                    reg_lib.hann2d(ch0.shape)
                    if window
                    else jnp.ones(ch0.shape, jnp.float32)
                )
                anchor = jnp.fft.fft2(ch0.astype(np.float32) * win)
                yield frame, zero, zero, None, None
                continue
            fft_win, new_cum, corr, step, resp = reg_lib.register_step(
                anchor, jnp.asarray(ch0), cum if mode == "previous" else zero,
                subpixel=subpixel, window=window, refine=refine,
                resample=resample,
            )
            if _reject_low_confidence(resp, min_response, reject_stats):
                yield frame, held, np.zeros(2, np.float32), resp, None
                continue
            if mode == "previous":
                anchor, cum = fft_win, new_cum
            held = np.asarray(new_cum, np.float32)
            yield frame, new_cum, step, resp, corr

    def estimate_frames_batched(src, resample):
        """Batched form of ``estimate_frames`` (first mode only): chunks
        of frames, one batched dispatch per chunk. With ``data_parallel``
        the dispatch is the mesh-sharded form — every chip correlates
        (and optionally resamples) its shard of the chunk against the
        replicated reference with zero inter-chip traffic; ``frame_batch``
        multiplies the frames per dispatch (single chip OR per chip),
        amortizing dispatch overhead on small frames. Yields the SAME
        per-frame tuples, so the consumer loops don't care which
        estimator ran."""
        from sequitr_tpu.ops import registration as _reg
        from sequitr_tpu.pipeline import infer as infer_lib

        if use_dp:
            from sequitr_tpu import parallel

            mesh = parallel.make_mesh()
            chunk_n = int(mesh.devices.size) * frame_batch
            run = parallel.make_dp_registerer(
                mesh, subpixel=subpixel, window=window, refine=refine,
                resample=resample,
            )
        else:
            chunk_n = frame_batch

            def run(ref_img, frames):
                return _reg.register_batch(
                    ref_img, frames, subpixel=subpixel, window=window,
                    refine=refine, resample=resample,
                )

        ref = None
        zero = np.zeros(2, np.float32)
        held = zero
        t, left = 0, len(src)
        for chunk in infer_lib._iter_read_ahead(
            _reads_fail_fast(job, src.chunks(chunk_n)), 2
        ):
            ch0 = chunk[..., 0] if chunk.ndim == 4 else chunk
            if ref is None:
                ref = jnp.asarray(ch0[0])
            shifts, resps, corrs = run(ref, jnp.asarray(ch0))
            shifts = np.asarray(shifts)
            resps = np.asarray(resps)
            # one bulk D2H per chunk, not one small sync per frame in
            # the write loop (the dummy (B,) no-resample case is free)
            corrs = np.asarray(corrs) if resample else None
            for k in range(min(chunk_n, left)):
                if t == 0:
                    # canonical reference-frame row: exact zeros, no
                    # response, the ORIGINAL pixels (no FFT round-trip)
                    yield chunk[0], zero, zero, None, None
                elif _reject_low_confidence(
                    resps[k], min_response, reject_stats
                ):
                    # hold the last accepted shift and discard the
                    # fused (bad-shift) resample
                    yield (
                        chunk[k], held, np.zeros(2, np.float32),
                        float(resps[k]), None,
                    )
                else:
                    held = shifts[k]
                    yield (
                        chunk[k],
                        shifts[k],
                        shifts[k],  # first mode: step == cum estimate
                        float(resps[k]),
                        corrs[k] if resample else None,
                    )
                t += 1
            left -= chunk_n

    estimator = estimate_frames_batched if use_batch else estimate_frames

    # chromatic alignment: each channel k > 0 carries a STATIC offset vs
    # channel 0 (chromatic aberration / camera registration); estimated
    # once as the per-channel median over sampled frames, then folded
    # into every frame's resample alongside the temporal drift. The
    # array is filled IN PLACE inside the managed `with source:` scope
    # below (the sampling reads frames); closures capture it here.
    align_channels = bool(p.get("align_channels", False))
    chan_offsets = np.zeros((source.n_channels, 2), np.float32)
    if align_channels and source.n_channels < 2:
        raise jobs_lib.JobError(
            "align_channels needs >= 2 input channels (one TIFF per "
            "channel)"
        )

    def measure_chan_offsets() -> None:
        n_sample = min(5, n_frames)
        # per channel: list of confident samples — the min_response gate
        # applies here too (a shutter-drop sample must not drag every
        # channel's static offset toward zero for the whole stack)
        samples = [[] for _ in range(source.n_channels)]
        for i in range(n_sample):
            fr = source.frame(i * (n_frames - 1) // max(n_sample - 1, 1))
            ch0 = jnp.asarray(fr[..., 0])
            for c in range(1, source.n_channels):
                s_c, r_c = reg_lib.phase_correlate(
                    ch0, jnp.asarray(fr[..., c]),
                    subpixel=subpixel, window=window, refine=refine,
                )
                if min_response and float(r_c) < min_response:
                    continue
                samples[c].append(np.asarray(s_c))
        est = np.zeros((source.n_channels, 2), np.float32)
        for c in range(1, source.n_channels):
            if not samples[c]:
                raise jobs_lib.JobError(
                    f"align_channels: no sampled frame reached "
                    f"min_response={min_response:g} for channel {c} — "
                    f"cannot measure its chromatic offset"
                )
            est[c] = np.median(np.stack(samples[c]), axis=0)
        if not subpixel:
            # integer mode rolls whole pixels: quantize the offsets so
            # the reported correction IS the applied correction (the
            # sub-pixel remainder cannot be applied losslessly)
            est = np.round(est)
        chan_offsets[:] = est

    def apply_cum(frame: np.ndarray, cum) -> np.ndarray:
        """Shift every channel of a native frame by the cumulative shift
        (+ that channel's static chromatic offset)."""
        cum = np.asarray(cum, np.float32)
        if not np.any(cum) and not np.any(chan_offsets):
            return frame  # reference frame: exact, no resample round-trip
        chans = frame[..., None] if frame.ndim == 2 else frame
        per_chan = []
        for c in range(chans.shape[-1]):
            s = cum + chan_offsets[c]
            if not np.any(s):
                per_chan.append(np.asarray(chans[..., c]))
            elif not subpixel:
                r = np.round(s).astype(int)
                per_chan.append(
                    np.roll(chans[..., c], (r[0], r[1]), axis=(0, 1))
                )
            else:
                per_chan.append(
                    np.asarray(
                        reg_lib.apply_shift(
                            jnp.asarray(chans[..., c]), jnp.asarray(s)
                        )
                    )
                )
        out = np.stack(per_chan, axis=-1)
        return out[..., 0] if frame.ndim == 2 else out

    # integer mode is lossless: the output keeps the native input dtype
    out_dtype = np.float32 if subpixel else source.dtype
    shifts_rows = []  # (t_abs, cum, step, resp)
    writers = []

    def open_writers(ys: slice = slice(0, h), xs: slice = slice(0, w)):
        ch = source.n_channels
        hh, ww = ys.stop - ys.start, xs.stop - xs.start
        est = float(n_frames) * hh * ww * np.dtype(out_dtype).itemsize
        names = (
            ["registered.tif"]
            if ch == 1
            else [f"registered_c{c}.tif" for c in range(ch)]
        )
        for name in names:
            writers.append(
                _append_writer(
                    os.path.join(job.output, name), est, _out_compression(job)
                )
            )
        return names

    def write_frame(frame: np.ndarray, ys: slice, xs: slice):
        chans = frame[..., None] if frame.ndim == 2 else frame
        for c, wr in enumerate(writers):
            with timer.phase("write"):
                wr.append(np.asarray(chans[ys, xs, c], dtype=out_dtype))

    def unwrapped_cums():
        """The physical (mod-N-resolved) trajectory; resampling is
        unaffected by wrapping, but crop selection and shifts.csv are.
        The mod-N period is the ESTIMATION frame size — with
        estimate_roi the estimates wrap at the ROI dims, not the
        frame's."""
        period = (
            (est_roi[2] - est_roi[0], est_roi[3] - est_roi[1])
            if est_roi is not None
            else (h, w)
        )
        return reg_lib.unwrap_trajectory(
            np.stack([c for c, _, _ in shifts_rows]), period
        )

    with source:
        try:
            if align_channels:
                measure_chan_offsets()
            if estimate_only or crop or est_roi is not None:
                # pass 1: estimate the trajectory only — on channel 0
                # alone (multi-channel stacks skip reading the rest),
                # with the fused resample compiled out (resample=False).
                # estimate_roi crops the ESTIMATION source (drift is
                # measured on a stable subregion, with ROI-sized FFTs)
                # while pass 2 resamples FULL frames by the trajectory.
                if source.n_channels > 1 or est_roi is not None:
                    # separate channel-0 source: close after pass 1
                    est_source = _apply_frame_range(
                        job, FrameSource(paths=[paths[0]])
                    )
                    if est_roi is not None:
                        try:
                            est_source.crop(*est_roi)
                        except ValueError as e:
                            est_source.close()
                            raise jobs_lib.JobError(
                                f"bad estimate_roi: {e}"
                            )
                else:
                    # pass 2 re-streams `source`: it must stay open
                    est_source = source
                try:
                    for _, cum, step, resp, _ in jobs_lib.track(
                        job,
                        estimator(est_source, resample=False),
                        total=n_frames,
                        phase="estimate",
                    ):
                        shifts_rows.append(
                            (np.asarray(cum), np.asarray(step), resp)
                        )
                finally:
                    if est_source is not source:
                        est_source.close()
                if not estimate_only:
                    ys, xs = slice(0, h), slice(0, w)
                    if crop:
                        # crop bounds cover every channel's TOTAL shift
                        # (temporal drift + its chromatic offset)
                        u = unwrapped_cums()
                        all_shifts = (
                            np.concatenate([u + off for off in chan_offsets])
                            if np.any(chan_offsets)
                            else u
                        )
                        try:
                            ys, xs = reg_lib.common_crop(
                                all_shifts, (h, w)
                            )
                        except ValueError as e:
                            raise jobs_lib.JobError(str(e))
                    names = open_writers(ys, xs)
                    # pass 2: apply + crop (lazy readers re-stream the
                    # stack). UNWRAPPED shifts: estimates are canonical
                    # mod the ESTIMATION window — identical operators
                    # for whole-frame estimation (the resample is
                    # wrap-invariant at the frame period) but off by a
                    # multiple of the ROI size under estimate_roi.
                    # (In practice first-mode ROI estimates degrade and
                    # are min_response-gated before cleanly wrapping;
                    # unwrapped application covers the periodic-content
                    # edge case where they do wrap cleanly.)
                    rows = iter(unwrapped_cums())
                    for frame in jobs_lib.track(
                        job, source.frames(), total=n_frames, phase="frames"
                    ):
                        cum = next(rows)
                        with timer.phase("infer"):
                            shifted = apply_cum(frame, cum)
                        write_frame(shifted, ys, xs)
            else:
                names = open_writers()
                # the fused on-device resample IS the output for
                # single-channel sub-pixel serves; integer mode keeps the
                # native dtype via a host roll, multi-channel resamples
                # each channel from the estimated trajectory
                use_fused = subpixel and source.n_channels == 1
                for frame, cum, step, resp, corr in jobs_lib.track(
                    job,
                    estimator(source, resample=use_fused),
                    total=n_frames,
                    phase="frames",
                ):
                    with timer.phase("infer"):
                        if use_fused and corr is not None:
                            shifted = np.asarray(corr)
                        else:
                            shifted = apply_cum(frame, cum)
                    write_frame(shifted, slice(0, h), slice(0, w))
                    shifts_rows.append((np.asarray(cum), np.asarray(step), resp))
        except BaseException:
            for wr in writers:
                wr.abort()
            raise
    for wr in writers:
        wr.close()

    cums = unwrapped_cums()
    shifts_path = os.path.join(job.output, "shifts.csv")
    tmp = shifts_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("frame,dy,dx,step_dy,step_dx,response\n")
        for i, (_, step, resp) in enumerate(shifts_rows):
            r = "" if resp is None else f"{float(resp):.3f}"
            f.write(
                f"{source.frame_offset + i},{cums[i][0]:.4f},{cums[i][1]:.4f},"
                f"{step[0]:.4f},{step[1]:.4f},{r}\n"
            )
    os.replace(tmp, shifts_path)

    total_s = time.time() - t0
    steps = np.stack([s for _, s, _ in shifts_rows[1:]]) if len(shifts_rows) > 1 else np.zeros((0, 2))
    resps = [float(r) for _, _, r in shifts_rows if r is not None]
    metrics = dict(
        timer.summary(),
        total_s=round(total_s, 4),
        n_frames=n_frames,
        max_drift_px=round(float(np.hypot(cums[:, 0], cums[:, 1]).max()), 3),
        rms_step_px=round(
            float(np.sqrt(np.mean(np.hypot(steps[:, 0], steps[:, 1]) ** 2)))
            if len(steps)
            else 0.0,
            3,
        ),
        min_response=round(min(resps), 3) if resps else None,
    )
    if align_channels:
        # keyed on the PARAM, not the value: a measured zero offset is a
        # result ("already co-registered"), not an absent measurement
        metrics["chromatic_offsets_px"] = [
            [round(float(v), 4) for v in off] for off in chan_offsets
        ]
    if min_response:
        metrics["n_low_confidence"] = reject_stats["n"]
    if frame_batch > 1:
        metrics["frame_batch"] = frame_batch
    if total_s > 0:
        metrics["frames_per_sec"] = round(n_frames / total_s, 3)
    out = {"shifts": shifts_path, "metrics": json.dumps(metrics)}
    if not estimate_only:
        for name in names:
            key = "registered" if name == "registered.tif" else name[:-4]
            out[key] = os.path.join(job.output, name)
    return out


def _register_volumes(
    job: Job,
    mode: str,
    subpixel: bool,
    window: bool,
    refine: int,
    crop: bool,
    estimate_only: bool,
    z: Optional[int] = None,
    min_response: float = 0.0,
    align_channels: bool = False,
) -> Dict[str, str]:
    """Volumetric (dims=3) body of ``register_stack``: one 3D phase
    correlation per timepoint over a sequence of (Z, H, W) volume files.

    Ingest is one ``VolumeSequence`` per channel (one multi-page TIFF per
    timepoint); channel 0 drives the estimate, every channel is resampled
    by the shared trajectory. Volumes stream one timepoint at a time —
    the same memory envelope as the 3D serving pipelines. Outputs
    per-timepoint ``registered_t{t:04d}[_c{k}].tif`` files (atomic
    write-then-rename each) mirroring the input convention, plus a
    dz/dy/dx ``shifts.csv`` and drift metrics.
    """
    import jax.numpy as jnp

    from sequitr_tpu.data.source import VolumeSequence
    from sequitr_tpu.ops import registration as reg_lib
    from sequitr_tpu.utils import PhaseTimer

    paths = _resolve_inputs(job)
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
    if n_t < 2:
        raise jobs_lib.JobError(
            f"job {job.id}: registration needs >= 2 timepoints (one "
            f"(Z, H, W) stack FILE per timepoint — a directory or glob "
            f"input entry); got {n_t}"
        )
    zhw = src.spatial
    timer = PhaseTimer()
    t0 = time.time()

    def read_volume(ch, t: int) -> np.ndarray:
        """One timepoint read, timed, deterministic on corrupt data."""
        with timer.phase("read"):
            try:
                return ch.volume(t)
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: {e}")

    reject_stats = {"n": 0}

    # static per-channel chromatic offsets (dz, dy, dx) vs channel 0 —
    # the volumetric mirror of the 2D align_channels path (axial
    # chromatic shift is real in multi-fluorophore z-stacks)
    chan_offsets = np.zeros((len(channels), 3), np.float32)
    if align_channels:
        if len(channels) < 2:
            raise jobs_lib.JobError(
                "align_channels needs >= 2 input channels (one volume "
                "sequence per channel)"
            )
        n_sample = min(3, n_t)
        samples = [[] for _ in range(len(channels))]
        for i in range(n_sample):
            t_i = i * (n_t - 1) // max(n_sample - 1, 1)
            v0 = jnp.asarray(read_volume(src, t_i))
            for c in range(1, len(channels)):
                s_c, r_c = reg_lib.phase_correlate(
                    v0, jnp.asarray(read_volume(channels[c], t_i)),
                    subpixel=subpixel, window=window, refine=refine,
                )
                if min_response and float(r_c) < min_response:
                    continue
                samples[c].append(np.asarray(s_c))
        for c in range(1, len(channels)):
            if not samples[c]:
                raise jobs_lib.JobError(
                    f"align_channels: no sampled timepoint reached "
                    f"min_response={min_response:g} for channel {c}"
                )
            chan_offsets[c] = np.median(np.stack(samples[c]), axis=0)
        if not subpixel:
            chan_offsets = np.round(chan_offsets)  # lossless-roll quantum

    def estimate_volumes(resample):
        """(vol_ch0, cum, step, resp, corrected_ch0) per timepoint.

        Yields the volume it read so the single-pass apply loop never
        re-reads the driving channel's file. The ``min_response`` gate
        holds the trajectory (and the anchor) when an estimate's PSR is
        below it — one blank/corrupt timepoint must not derail the
        sequence (see the 2D estimator's docstring)."""
        anchor = None
        cum = jnp.zeros(3, jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        held = np.zeros(3, np.float32)
        for t in range(n_t):
            v = read_volume(src, t)
            if anchor is None:
                win = (
                    reg_lib.hann_window(zhw)
                    if window
                    else jnp.ones(zhw, jnp.float32)
                )
                anchor = jnp.fft.fftn(jnp.asarray(v, jnp.float32) * win)
                yield v, zero, zero, None, None
                continue
            fft_win, new_cum, corr, step, resp = reg_lib.register_step(
                anchor,
                jnp.asarray(v),
                cum if mode == "previous" else zero,
                subpixel=subpixel,
                window=window,
                refine=refine,
                resample=resample,
            )
            if _reject_low_confidence(resp, min_response, reject_stats):
                yield v, held, np.zeros(3, np.float32), resp, None
                continue
            if mode == "previous":
                anchor, cum = fft_win, new_cum
            held = np.asarray(new_cum, np.float32)
            yield v, new_cum, step, resp, corr

    # integer mode keeps native values; mixed channel dtypes promote the
    # same way FrameSource.dtype does for the 2D path (np.result_type),
    # never silently truncating a float channel into channel 0's ints
    out_dtype = (
        np.float32
        if subpixel
        else np.result_type(*[c.dtype for c in channels])
    )

    def apply_cum(vol: np.ndarray, cum) -> np.ndarray:
        if not np.any(np.asarray(cum)):
            return vol
        if not subpixel:
            r = np.round(np.asarray(cum)).astype(int)
            return np.roll(vol, tuple(r), axis=(0, 1, 2))
        return np.asarray(reg_lib.apply_shift(jnp.asarray(vol), cum))

    def vol_name(t_abs: int, c: int) -> str:
        suffix = "" if len(channels) == 1 else f"_c{c}"
        return f"registered_t{t_abs:04d}{suffix}.tif"

    def write_volume(t: int, vol_by_channel, sl) -> None:
        for c, v in enumerate(vol_by_channel):
            with timer.phase("write"):
                out = np.asarray(v[sl], dtype=out_dtype)
                # TiffAppendWriter is already atomic (write-temp-rename)
                # and goes BigTIFF when a volume could brush the classic
                # 4 GiB offset limit; compress_output is honored as in 2D
                w = _append_writer(
                    os.path.join(
                        job.output, vol_name(src.frame_offset + t, c)
                    ),
                    float(out.nbytes),
                    _out_compression(job),
                )
                try:
                    for plane in out:
                        w.append(plane)
                except BaseException:
                    w.abort()
                    raise
                w.close()

    shifts_rows = []  # (cum, step, resp)

    def unwrapped_cums():
        return reg_lib.unwrap_trajectory(
            np.stack([c for c, _, _ in shifts_rows]), zhw
        )

    full = tuple(slice(0, n) for n in zhw)
    try:
        if estimate_only or crop:
            for _, cum, step, resp, _ in jobs_lib.track(
                job, estimate_volumes(resample=False), total=n_t,
                phase="estimate",
            ):
                shifts_rows.append((np.asarray(cum), np.asarray(step), resp))
            if not estimate_only:
                sl = full
                if crop:
                    try:
                        u = unwrapped_cums()
                        all_shifts = (
                            np.concatenate([u + off for off in chan_offsets])
                            if np.any(chan_offsets)
                            else u
                        )
                        sl = reg_lib.common_crop(all_shifts, zhw)
                    except ValueError as e:
                        raise jobs_lib.JobError(str(e))
                rows = iter(shifts_rows)
                for t in jobs_lib.track(
                    job, range(n_t), total=n_t, phase="volumes"
                ):
                    cum, _, _ = next(rows)
                    vols = [read_volume(ch, t) for ch in channels]
                    with timer.phase("infer"):
                        vols = [
                            apply_cum(v, np.asarray(cum) + chan_offsets[ci])
                            for ci, v in enumerate(vols)
                        ]
                    write_volume(t, vols, sl)
        else:
            use_fused = subpixel and len(channels) == 1
            rows_iter = estimate_volumes(resample=use_fused)
            for t, (v0, cum, step, resp, corr) in enumerate(
                jobs_lib.track(job, rows_iter, total=n_t, phase="volumes")
            ):
                extra = [read_volume(ch, t) for ch in channels[1:]]
                with timer.phase("infer"):
                    if use_fused:
                        # corr is None for the reference row AND for
                        # confidence-rejected timepoints — both resample
                        # by the held cum (zero-shift short-circuits)
                        vols = [
                            np.asarray(corr)
                            if corr is not None
                            else apply_cum(v0, cum)
                        ]
                    else:
                        vols = [
                            apply_cum(v, np.asarray(cum) + chan_offsets[ci])
                            for ci, v in enumerate([v0] + extra)
                        ]
                write_volume(t, vols, full)
                shifts_rows.append((np.asarray(cum), np.asarray(step), resp))
    finally:
        for ch in channels:
            ch.close()  # frees each sequence's cached first volume

    cums = unwrapped_cums()
    shifts_path = os.path.join(job.output, "shifts.csv")
    tmp = shifts_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("frame,dz,dy,dx,step_dz,step_dy,step_dx,response\n")
        for i, (_, step, resp) in enumerate(shifts_rows):
            r = "" if resp is None else f"{float(resp):.3f}"
            f.write(
                f"{src.frame_offset + i},"
                f"{cums[i][0]:.4f},{cums[i][1]:.4f},{cums[i][2]:.4f},"
                f"{step[0]:.4f},{step[1]:.4f},{step[2]:.4f},{r}\n"
            )
    os.replace(tmp, shifts_path)

    total_s = time.time() - t0
    steps = (
        np.stack([s for _, s, _ in shifts_rows[1:]])
        if len(shifts_rows) > 1
        else np.zeros((0, 3))
    )
    resps = [float(r) for _, _, r in shifts_rows if r is not None]
    metrics = dict(
        timer.summary(),
        total_s=round(total_s, 4),
        n_volumes=n_t,
        max_drift_px=round(
            float(np.linalg.norm(cums, axis=1).max()), 3
        ),
        rms_step_px=round(
            float(np.sqrt(np.mean(np.linalg.norm(steps, axis=1) ** 2)))
            if len(steps)
            else 0.0,
            3,
        ),
        min_response=round(min(resps), 3) if resps else None,
    )
    if min_response:
        metrics["n_low_confidence"] = reject_stats["n"]
    if align_channels:
        metrics["chromatic_offsets_px"] = [
            [round(float(v), 4) for v in off] for off in chan_offsets
        ]
    if total_s > 0:
        metrics["volumes_per_sec"] = round(n_t / total_s, 3)
    out = {"shifts": shifts_path, "metrics": json.dumps(metrics)}
    if not estimate_only:
        out["registered"] = job.output
    return out


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
    )
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


@register("stitch_mosaic")
def stitch_mosaic_job(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    """Stitch a grid of overlapping fields of view into one mosaic.

    Exposes ``sequitr_tpu.mosaic`` through the job API (no model).
    Slide scanners / motorized stages acquire large samples as an
    (R, C) grid of overlapping tiles; this produces the single
    stationary composite every downstream pipeline wants (the reference
    delegates this to Fiji's Grid/Collection stitching — an extension,
    COMPONENTS.md). Pairwise seam offsets are measured with the
    registration stack's phase correlator batched over ALL seams of a
    direction in one dispatch, positions come from a weighted global
    least-squares solve, and the composite is feather-blended
    (mosaic.py design notes). params:

    * ``grid``: [rows, cols] — REQUIRED; tiles arrive in acquisition
      order as R*C single-frame TIFFs (directory/glob entry, natural
      sort) or one R*C-page stack.
    * ``overlap``: nominal seam overlap — px int, fraction of the tile
      in (0, 1), or a per-axis [oy, ox] pair (default 0.1).
    * ``order``: ``"row"`` (default) or ``"snake"`` (serpentine stage
      scans: odd rows acquired right-to-left).
    * ``subpixel`` (default true): sub-pixel seam estimates + batched
      fractional Fourier-shift placement; false = whole-pixel (lossless
      — use for label tiles).
    * ``window`` (default true), ``refine`` (default 2): forwarded to
      the phase correlator (same semantics as register_stack).
    * ``min_response`` (default 0 = off): PSR confidence gate — seams
      below it (featureless overlap: empty glass) fall back to nominal
      grid spacing at near-zero weight instead of shearing the mosaic.
    * ``estimate_only`` (default false): write positions/seams CSVs only.
    * ``positions``: REUSE a previous solve instead of estimating — a
      positions.csv path, a previous stitch job's output dir (chains
      via ``depends_on``: one ``estimate_only`` stitch, then every
      later acquisition round composites at the same stage coordinates),
      or an inline row-major ``[[y, x], ...]`` list.
    * ``flatfield`` (default false): retrospective flat-field
      correction — the shading/vignetting profile every tile shares is
      estimated per channel (median across tiles + low-order polynomial
      fit, ``mosaic.estimate_flatfield``) and divided out before seam
      estimation and blending; uncorrected vignetting prints a dark
      grid of seams into the composite. ``true`` = order 2; an integer
      sets the polynomial order (up to 6). Profile min/max land in the
      metrics.
    * ``match_gains`` (default false): per-tile gain matching —
      photobleaching makes later tiles of a scan dimmer by a per-TILE
      factor flat-field cannot express (the blend then shows intensity
      steps at seams). Adjacent tiles image the same content in their
      overlap, so strip-median ratios give per-seam gain differences
      and an anchored log-space least-squares solves per-tile gains
      (product normalized to 1; blank seams skipped). Composes with
      ``flatfield`` (shading first, then gains); gain range lands in
      the metrics.
    * ``data_parallel`` (default false): shard the seam-pair axis over
      all chips of the mesh (``parallel.make_dp_seam_correlator``) —
      seam estimates are independent, so each chip correlates its share
      with zero inter-chip traffic (a 20x20 slide scan has 760 seams).
      Output identical to single-device.

    Multi-channel: the uniform convention — one input entry per channel
    (each an R*C tile sequence in the same acquisition order). Seams are
    estimated on channel 0 and the SAME positions composite every
    channel (they share the stage, exactly like register_stack's
    trajectory riding channel 0); outputs ``mosaic_c{k}.tif``.

    ``timelapse: true`` — multi-position LIVE imaging (the btrack
    acquisition shape): each of the R*C files in an entry is one stage
    position's T-page timelapse. Positions are fixed across time, so
    seams are estimated once (channel 0, timepoint 0) and the same
    solved positions composite every timepoint, streamed page-by-page
    (read-ahead, bounded memory, cancellable) into a T-page
    ``mosaic.tif`` — which feeds straight into ``segmentation_*`` →
    ``track_objects`` as one chain.

    Outputs: ``mosaic.tif`` (float32 composite; uncovered rim px are 0)
    or per-channel ``mosaic_c{k}.tif``, ``positions.csv`` (tile, row,
    col, y, x — canvas-coordinate tile origins), ``seams.csv`` (i, j,
    dy, dx, response, used — the per-seam measurements and their
    confidence; used=0 marks nominal fallbacks), and metrics incl.
    ``rms_residual`` px (post-solve seam disagreement — the
    stitch-consistency QC number; large values mean stage nonlinearity,
    a wrong overlap hint, or sample motion).

    ``backend``: ``"device"`` (default), ``"cpu"``, or ``"auto"``. Small
    mosaics are dispatch-latency bound, not compute bound — on this
    relay-tunneled topology the 3x3 bench measured 37.6 tiles/s on the
    chip vs 75.3 on the host CPU, and the COLD device path paid a 797 s
    first remote compile vs 2.1 s total on the host (BASELINE.md
    round-4 FINAL-2 + continuation-6) — so ``"cpu"`` pins the whole
    stitch to the host CPU backend. Single-device by definition (rejects
    ``data_parallel``); big slide scans with hundreds of seams stay on
    the device. ``"auto"`` applies that measurement as policy: grids at
    or under 16 seams (≈3x3) run on the host unless ``data_parallel``
    is set or the host IS the default backend; anything larger — where
    the batched correlator amortizes — stays on the device. The
    resolved choice lands in the outputs.
    """
    backend = _resolve_mosaic_backend(job)
    if backend == "cpu":
        if job.params.get("data_parallel"):
            raise jobs_lib.JobError(
                "backend: 'cpu' pins the stitch to the host (single "
                "device); it cannot combine with data_parallel"
            )
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            outputs = _stitch_mosaic_body(job, config)
    else:
        outputs = _stitch_mosaic_body(job, config)
    outputs["backend"] = backend
    return outputs


def _resolve_mosaic_backend(job: Job) -> str:
    """Resolve the ``backend`` param to 'device' or 'cpu'.

    ``auto`` picks the host for dispatch-latency-bound SMALL grids
    (seam-pair count <= 16, the measured 3x3 regime where the host beat
    the chip 2x warm and 380x cold — BASELINE.md continuation-6) when a
    non-CPU default backend exists and ``data_parallel`` is off; larger
    scans amortize the batched seam correlator and stay on the device.
    A malformed ``grid`` resolves to 'device' and fails the body's own
    validation loudly.
    """
    backend = str(job.params.get("backend", "device"))
    if backend not in ("device", "cpu", "auto"):
        raise jobs_lib.JobError(
            f"backend={backend!r} must be 'device', 'cpu', or 'auto'"
        )
    if backend != "auto":
        return backend
    import jax

    grid = job.params.get("grid")
    seams = None
    if (
        isinstance(grid, (list, tuple)) and len(grid) == 2
        and all(
            isinstance(v, int) and not isinstance(v, bool) and v >= 1
            for v in grid
        )
    ):
        r, c = int(grid[0]), int(grid[1])
        seams = r * (c - 1) + (r - 1) * c
    small = seams is not None and seams <= 16
    if (
        small
        and not job.params.get("data_parallel")
        and jax.default_backend() != "cpu"
    ):
        return "cpu"
    return "device"


def _stitch_mosaic_body(job: Job, config: ServerConfiguration) -> Dict[str, str]:
    from sequitr_tpu import mosaic as mosaic_lib
    from sequitr_tpu.data.source import FrameSource
    from sequitr_tpu.utils import PhaseTimer

    p = job.params
    grid = p.get("grid")
    if (
        not isinstance(grid, (list, tuple))
        or len(grid) != 2
        or not all(
            isinstance(v, int) and not isinstance(v, bool) and v >= 1
            for v in grid
        )
    ):
        raise jobs_lib.JobError(
            f"grid={grid!r} must be [rows, cols] with positive integers"
        )
    r, c = int(grid[0]), int(grid[1])
    order = p.get("order", "row")
    if order not in ("row", "snake"):
        raise jobs_lib.JobError(f"order={order!r} must be 'row' or 'snake'")
    subpixel = bool(p.get("subpixel", True))
    window = bool(p.get("window", True))
    refine = int(p.get("refine", 2))
    if not 1 <= refine <= 8:
        raise jobs_lib.JobError(f"refine={refine} must be in [1, 8]")
    try:
        min_response = float(p.get("min_response", 0.0))
    except (TypeError, ValueError):
        raise jobs_lib.JobError(
            f"min_response={p.get('min_response')!r} must be a number"
        )
    if not 0.0 <= min_response < float("inf"):
        raise jobs_lib.JobError(
            f"min_response={min_response!r} must be a finite number >= 0"
        )
    estimate_only = bool(p.get("estimate_only", False))

    import jax as _jax

    correlate = None
    dp_devices = 0
    if (
        bool(p.get("data_parallel"))
        and _jax.device_count() > 1
        # a positions-reuse job never correlates seams: building the
        # mesh + DP correlator would cost device init for nothing and
        # report n_devices as if seams had been sharded
        and p.get("positions") is None
    ):
        from sequitr_tpu import parallel

        _mesh = parallel.make_mesh()
        dp_devices = int(_mesh.devices.size)
        correlate = parallel.make_dp_seam_correlator(
            _mesh, subpixel=subpixel, window=window, refine=refine
        )

    timelapse = bool(p.get("timelapse", False))
    timer = PhaseTimer()
    t0 = time.time()
    entries = _resolve_inputs(job)
    # one input entry per CHANNEL (the uniform convention); channels are
    # read LAZILY one at a time — estimation and each blend need a
    # single channel, so host memory stays O(one channel's tiles)
    kw = dict(
        subpixel=subpixel, window=window, refine=refine,
        min_response=min_response, estimate_only=estimate_only,
        correlate=correlate, dp_devices=dp_devices, order=order,
        timer=timer, t0=t0,
    )
    if timelapse:
        return _stitch_mosaic_timelapse(job, r, c, entries, **kw)

    sources = []
    try:
        for pth in entries:
            try:
                sources.append(FrameSource(paths=[pth]))
            except ValueError as e:
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read {pth}: {e}"
                )
        if len(sources[0]) != r * c:
            raise jobs_lib.JobError(
                f"{len(sources[0])} tiles for a {r}x{c} grid "
                f"(need {r * c})"
            )
        h, w = sources[0].spatial
        for k, s in enumerate(sources[1:], 1):
            if len(s) != r * c or s.spatial != (h, w):
                raise jobs_lib.JobError(
                    f"channel {k} ({entries[k]}) disagrees: {len(s)} "
                    f"tiles of {s.spatial} vs {r * c} of {(h, w)}"
                )

        def read_chan_t(k: int, t: int) -> np.ndarray:
            return np.stack(
                [
                    np.asarray(f, np.float32)
                    for f in sources[k].frames()
                ]
            )

        return _stitch_mosaic_core(
            job, r, c, n_chan=len(sources), n_t=1, spatial=(h, w),
            read_chan_t=read_chan_t, **kw,
        )
    finally:
        for s in sources:
            s.close()


def _write_mosaic_csvs(job: Job, result, r: int, c: int) -> Dict[str, str]:
    """positions.csv + seams.csv (write-temp-rename), shared by the
    single-shot and timelapse stitch paths."""
    pos_path = os.path.join(job.output, "positions.csv")
    tmp = pos_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("tile,row,col,y,x\n")
        for k in range(r * c):
            f.write(
                f"{k},{k // c},{k % c},"
                f"{result.positions[k, 0]:.4f},{result.positions[k, 1]:.4f}\n"
            )
    os.replace(tmp, pos_path)
    seams_path = os.path.join(job.output, "seams.csv")
    tmp = seams_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("i,j,dy,dx,response,used\n")
        for e in range(len(result.edges)):
            f.write(
                f"{result.edges[e, 0]},{result.edges[e, 1]},"
                f"{result.offsets[e, 0]:.4f},{result.offsets[e, 1]:.4f},"
                f"{result.responses[e]:.3f},{int(result.used[e])}\n"
            )
    os.replace(tmp, seams_path)
    return {"positions": pos_path, "seams": seams_path}


class _TilePool:
    """fd-capped lazy FrameSource pool for per-position timelapse files.

    Mirrors ``_SequenceReader._MAX_OPEN``'s rationale at job scale: a
    20x20 3-channel scan is 1200 files, and holding a reader open per
    file would exhaust the default 1024-fd table. Readers open on
    demand and an LRU evicts past the budget (half the soft RLIMIT, so
    the worker's own files/sockets keep headroom); typical jobs stay
    fully resident, giant ones re-parse an evicted file's IFD chain on
    return — slower, never wrong.
    """

    def __init__(self, paths):
        import resource
        from collections import OrderedDict

        soft = resource.getrlimit(resource.RLIMIT_NOFILE)[0]
        if soft == resource.RLIM_INFINITY:
            soft = 8192
        self.max_open = max(8, int(soft) // 2)
        self._paths = list(paths)
        self._open: "OrderedDict[int, object]" = OrderedDict()

    def source(self, i: int):
        from sequitr_tpu.data.source import FrameSource

        src = self._open.pop(i, None)
        if src is None:
            if len(self._open) >= self.max_open:
                _, old = self._open.popitem(last=False)
                old.close()
            try:
                src = FrameSource(paths=[self._paths[i]])
            except ValueError as e:
                raise ValueError(f"{self._paths[i]}: {e}")
        self._open[i] = src  # most-recently-used position
        return src

    def path(self, i: int) -> str:
        return self._paths[i]

    def close(self) -> None:
        for src in self._open.values():
            src.close()
        self._open.clear()


def _stitch_mosaic_timelapse(
    job: Job,
    r: int,
    c: int,
    entries,
    **kw,
) -> Dict[str, str]:
    """``stitch_mosaic`` with ``timelapse: true`` — multi-position live
    imaging (the btrack acquisition shape: a fixed grid of stage
    positions re-imaged every cycle).

    Conventions: each input ENTRY is one channel (uniform multi-channel
    convention); inside an entry, each of the R*C files
    (directory/glob, natural order; ``order: snake`` for serpentine
    stage scans) is one POSITION's T-page timelapse. Stage positions
    are fixed across time, so seams are estimated ONCE — channel 0,
    timepoint 0 — and the same solved positions composite EVERY
    timepoint (the shared ``_stitch_mosaic_core`` streaming loop).
    Outputs a T-page ``mosaic.tif`` (or ``mosaic_c{k}.tif``) — the
    stitched timelapse feeds straight into segmentation → objects.h5 →
    tracking. File handles ride an fd-capped pool (``_TilePool``).
    """
    chan_files = []
    for pth in entries:
        files = _expand_inputs_entry(pth)
        if len(files) != r * c:
            raise jobs_lib.JobError(
                f"{len(files)} tile timelapses for a {r}x{c} grid "
                f"(need {r * c}) in {pth}"
            )
        chan_files.append(files)
    n_chan = len(chan_files)
    pool = _TilePool([f for cf in chan_files for f in cf])
    try:
        # validate every position once (each opens through the pool)
        try:
            first = pool.source(0)
            n_t = len(first)
            h, w = first.spatial
        except ValueError as e:
            raise jobs_lib.JobError(f"job {job.id}: cannot read {e}")
        for i in range(1, n_chan * r * c):
            try:
                s = pool.source(i)
            except ValueError as e:
                raise jobs_lib.JobError(f"job {job.id}: cannot read {e}")
            if len(s) != n_t or s.spatial != (h, w):
                raise jobs_lib.JobError(
                    f"{pool.path(i)} disagrees: {len(s)} timepoints of "
                    f"{s.spatial} vs {n_t} of {(h, w)}"
                )

        def read_chan_t(k: int, t: int) -> np.ndarray:
            base = k * r * c
            return np.stack(
                [
                    np.asarray(
                        pool.source(base + pos).frame(t), np.float32
                    )
                    for pos in range(r * c)
                ]
            )

        return _stitch_mosaic_core(
            job, r, c, n_chan=n_chan, n_t=n_t, spatial=(h, w),
            read_chan_t=read_chan_t, **kw,
        )
    finally:
        pool.close()


def _stitch_mosaic_core(
    job: Job,
    r: int,
    c: int,
    *,
    n_chan: int,
    n_t: int,
    spatial,
    read_chan_t,
    order: str,
    subpixel: bool,
    window: bool,
    refine: int,
    min_response: float,
    estimate_only: bool,
    correlate,
    dp_devices: int,
    timer,
    t0: float,
) -> Dict[str, str]:
    """Shared stitch engine: estimate once on (channel 0, timepoint 0),
    then stream one composite per (timepoint, channel) to page-append
    writers with disk read-ahead overlapping the blend.

    ``read_chan_t(k, t) -> (R*C, H, W) float32`` tiles in ACQUISITION
    order — the core applies the serpentine permutation, so readers
    stay order-agnostic. The single-shot path is simply ``n_t=1``; the
    timelapse path streams T pages per channel through the same loop
    (bounded memory, cancellable).
    """
    from sequitr_tpu import mosaic as mosaic_lib
    from sequitr_tpu.pipeline import infer as infer_lib

    h, w = spatial
    perm = (
        mosaic_lib.snake_indices((r, c))
        if order == "snake"
        else np.arange(r * c)
    )

    raw_first = {"tiles": None}

    def first_tiles() -> np.ndarray:
        """(Channel 0, timepoint 0) tiles, row-major, read once and
        shared by overlap auto-estimation, the correction fits and the
        seam estimate."""
        if raw_first["tiles"] is None:
            try:
                raw_first["tiles"] = read_chan_t(0, 0)[perm]
            except ValueError as e:
                # corrupt input is deterministic — fail fast, no retry
                raise jobs_lib.JobError(
                    f"job {job.id}: cannot read inputs: {e}"
                )
        return raw_first["tiles"]

    ov_param = job.params.get("overlap", 0.1)
    overlap_estimated = False
    if isinstance(ov_param, str):
        if ov_param != "auto":
            raise jobs_lib.JobError(
                f"overlap={ov_param!r} must be px / fraction / [oy, ox] "
                f"/ 'auto'"
            )
        # the one parameter a user can get wrong, measured from the data:
        # whole-tile correlation of adjacent pairs wraps W - ov to -ov
        # (mosaic.estimate_overlap)
        try:
            overlap = mosaic_lib.estimate_overlap(first_tiles(), (r, c))
        except ValueError as e:
            raise jobs_lib.JobError(str(e))
        overlap_estimated = True
    else:
        try:
            overlap = mosaic_lib.normalize_overlap(ov_param, (h, w))
        except (TypeError, ValueError) as e:
            raise jobs_lib.JobError(f"bad overlap: {e}")
    # retrospective flat-field: every tile sees the same optical path,
    # so the shading profile is estimated per channel from its first
    # timepoint's tiles and divided out of every tile before seam
    # estimation AND blending (vignetting otherwise prints a dark grid
    # of seams into the composite)
    ff_param = job.params.get("flatfield", False)
    if ff_param is True:
        ff_order = 2
    elif ff_param is False or ff_param is None:
        ff_order = 0
    else:
        try:
            ff_order = int(ff_param)
        except (TypeError, ValueError):
            raise jobs_lib.JobError(
                f"flatfield={ff_param!r} must be a boolean or the "
                f"polynomial order"
            )
        # 1/0 are the common hand-written JSON boolean spellings: treat
        # them as on/off (order 1 would silently fit a PLANE, which
        # cannot express the radial vignette this feature removes)
        if ff_order == 0:
            pass
        elif ff_order == 1:
            ff_order = 2
        elif not 2 <= ff_order <= 6:
            raise jobs_lib.JobError(
                f"flatfield order {ff_order} must be in [2, 6] "
                f"(or a boolean)"
            )
    match_gains = bool(job.params.get("match_gains", False))
    profiles: Dict[int, np.ndarray] = {}
    gains: Dict[int, np.ndarray] = {}

    def corrected(k: int, tiles: np.ndarray) -> np.ndarray:
        """Correct one channel's ROW-MAJOR tile stack: flat-field
        (per-pixel shading shared by all tiles), then per-tile gain
        matching (photobleaching across the scan — a per-TILE factor
        flat-field cannot express). Both estimated once per channel
        from its first timepoint and reused."""
        if ff_order:
            if k not in profiles:
                profiles[k] = mosaic_lib.estimate_flatfield(
                    tiles, order=ff_order
                )
            tiles = tiles / profiles[k]
        if match_gains:
            if k not in gains:
                gains[k] = mosaic_lib.solve_tile_gains(
                    tiles, (r, c), overlap
                )
            tiles = tiles * gains[k][:, None, None]
        return tiles

    with timer.phase("estimate"):
        given = job.params.get("positions")
        if given is not None:
            # reuse a previous job's solve (chain: one estimate_only
            # stitch, then every later acquisition round composites at
            # the same stage coordinates without re-estimating)
            result = _load_mosaic_positions(job, given, r, c)
            if (ff_order or match_gains) and estimate_only:
                # the blend loop (which fits profiles lazily on first
                # use) never runs in estimate_only mode, so pre-fit here
                # or the metrics would miss the profile/gain ranges; in
                # blending runs, pre-fitting would just read channel 0
                # twice
                corrected(0, first_tiles())
        else:
            first = corrected(0, first_tiles())
            result = mosaic_lib.stitch_grid(
                first, (r, c), overlap=overlap, order="row",
                subpixel=subpixel, window=window, refine=refine,
                min_response=min_response, blend=False,
                correlate=correlate,
            )

    outputs: Dict[str, str] = {}
    canvas_shape = None
    if not estimate_only:
        comp = _out_compression(job)
        writers: list = [None] * n_chan

        def produce():
            for t in range(n_t):
                for k in range(n_chan):
                    yield k, read_chan_t(k, t)

        work = jobs_lib.track(
            job,
            infer_lib._iter_read_ahead(produce(), 2),
            total=n_t * n_chan, phase="composites",
        )
        try:
            for k, tiles in _reads_fail_fast(job, iter(work)):
                with timer.phase("blend"):
                    composite = mosaic_lib.blend_mosaic(
                        corrected(k, tiles[perm]), result.positions,
                        overlap, subpixel=subpixel,
                    )
                canvas_shape = composite.shape
                if writers[k] is None:
                    name = "mosaic" if n_chan == 1 else f"mosaic_c{k}"
                    path = os.path.join(job.output, f"{name}.tif")
                    writers[k] = (
                        name, path,
                        _append_writer(
                            path, float(composite.nbytes) * n_t, comp
                        ),
                    )
                with timer.phase("write"):
                    writers[k][2].append(composite)
        except BaseException:
            for wr in writers:
                if wr is not None:
                    wr[2].abort()
            raise
        for name, path, writer in writers:
            writer.close()
            outputs[name] = path

    outputs.update(_write_mosaic_csvs(job, result, r, c))
    total_s = time.time() - t0
    metrics = dict(
        timer.summary(),
        total_s=round(total_s, 4),
        n_tiles=r * c,
        rms_residual_px=round(result.rms_residual, 5),
        n_low_confidence=int((~result.used).sum()),
        overlap_y=overlap[0],
        overlap_x=overlap[1],
    )
    if overlap_estimated:
        metrics["overlap_estimated"] = True
    if n_t > 1:
        metrics["n_timepoints"] = n_t
        metrics["timepoints_per_sec"] = round(
            n_t / max(total_s, 1e-9), 3
        )
    else:
        metrics["tiles_per_sec"] = round(r * c / max(total_s, 1e-9), 3)
    if dp_devices:
        metrics["n_devices"] = dp_devices
    if canvas_shape is not None:
        metrics["canvas_h"] = int(canvas_shape[0])
        metrics["canvas_w"] = int(canvas_shape[1])
    if profiles:
        metrics["flatfield_min"] = round(
            float(min(pr.min() for pr in profiles.values())), 4
        )
        metrics["flatfield_max"] = round(
            float(max(pr.max() for pr in profiles.values())), 4
        )
    if gains:
        metrics["gain_min"] = round(
            float(min(g.min() for g in gains.values())), 4
        )
        metrics["gain_max"] = round(
            float(max(g.max() for g in gains.values())), 4
        )
    outputs["metrics"] = json.dumps(metrics)
    return outputs


def _load_mosaic_positions(job: Job, given, r: int, c: int):
    """A ``positions`` param → MosaicResult shell: a positions.csv path,
    the output DIR of a previous stitch job (chains via depends_on), or
    an inline [[y, x], ...] list (row-major). No seams were measured, so
    edges/offsets are empty and rms_residual is 0 — seams.csv records
    the reuse honestly (header only)."""
    from sequitr_tpu import mosaic as mosaic_lib

    if isinstance(given, str):
        path = given
        if os.path.isdir(path):
            path = os.path.join(path, "positions.csv")
        try:
            rows = np.loadtxt(
                path, delimiter=",", skiprows=1, ndmin=2
            )
        except (OSError, ValueError) as e:
            raise jobs_lib.JobError(
                f"job {job.id}: cannot read positions {path}: {e}"
            )
        if rows.shape[1] < 5:
            raise jobs_lib.JobError(
                f"positions file {path} is not a stitch positions.csv "
                f"(tile,row,col,y,x)"
            )
        pos = rows[np.argsort(rows[:, 0])][:, 3:5]
    elif isinstance(given, (list, tuple)):
        try:
            pos = np.asarray(given, dtype=np.float64)
        except (TypeError, ValueError) as e:
            raise jobs_lib.JobError(
                f"inline positions must be [[y, x], ...]: {e}"
            )
        if pos.ndim != 2 or pos.shape[1] != 2:
            raise jobs_lib.JobError(
                f"inline positions must be [[y, x], ...], got shape "
                f"{pos.shape}"
            )
    else:
        raise jobs_lib.JobError(
            f"positions={given!r} must be a positions.csv path, a "
            f"previous stitch job's output dir, or an inline list"
        )
    if len(pos) != r * c:
        raise jobs_lib.JobError(
            f"{len(pos)} positions for a {r}x{c} grid (need {r * c})"
        )
    if not np.isfinite(pos).all():
        # a NaN would turn floor().astype(int64) into INT64_MIN deep in
        # the blend — reject deterministically instead
        raise jobs_lib.JobError("positions contain non-finite values")
    pos = pos - pos.min(axis=0, keepdims=True)
    return mosaic_lib.MosaicResult(
        positions=pos,
        edges=np.zeros((0, 2), np.int64),
        offsets=np.zeros((0, 2)),
        responses=np.zeros(0),
        used=np.zeros(0, bool),
        rms_residual=0.0,
        mosaic=None,
    )
