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
    allow_polyphase: bool = False,
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
    # polyphase serving forward (models.polyphase): only the pipelines
    # that honor it read the param — elsewhere it stays unread and the
    # completion status carries the unknown-param warning
    poly = bool(params.get("polyphase", False)) if allow_polyphase else False
    # 2D phases all axes; 3D phases (H, W) only — z is never phased
    if poly and any(p % 2 for p in patch[-2:]):
        raise jobs_lib.JobError(
            f"polyphase needs even H/W patch axes, got {tuple(patch)}"
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
            polyphase=poly,
        )
    except ValueError as e:
        # bad tiling/dtype params are deterministic — fail fast, never retry
        raise jobs_lib.JobError(str(e))


def _require_polyphase_model(cfg) -> None:
    """Deterministic rejection for models the polyphase serve can't cover
    (``cfg``: the serving model's ``unet.UNetConfig``, 2D or 3D); shared
    by every pipeline with a ``polyphase`` param."""
    if cfg.space_to_depth != 1 or cfg.upsample != "transpose" or cfg.depth < 2:
        raise jobs_lib.JobError(
            "polyphase serving requires a space_to_depth=1 "
            "transpose-upsample model of depth >= 2; this model has "
            f"s2d={cfg.space_to_depth}, upsample={cfg.upsample!r}, "
            f"depth={cfg.depth}"
        )


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
    # labels-only jobs (the default: save_probs/save_entropy off) serve
    # the labels-only graph — the softmax-map half is never computed or
    # materialized (measured 77.7 vs 68.7 fps at the 1024^2 north star).
    # The DP/spatial paths above keep the dual graph (their output
    # shardings expect both halves).
    tc = dataclasses.replace(tc, emit_probs=want_probs)
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
                yield infer_lib.InferenceResult(
                    probs=None if probs is None else probs[k],
                    labels=labels[k],
                )
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


def _volume_chunks(seq, n: int):
    """float32 view of ``VolumeSequence.chunks`` (the DP dispatch feed —
    localization dispatches take float32; denoise casts at device_put)."""
    for c in seq.chunks(n):
        yield np.asarray(c, np.float32)


# ---------------------------------------------------------------------------
# built-in pipelines (per-family modules; importing registers their jobs)
# ---------------------------------------------------------------------------

from sequitr_tpu.server.pipelines import (  # noqa: E402,F401
    gan_denoise as _pipelines_gan_denoise,
    geometry as _pipelines_geometry,
    instances as _pipelines_instances,
    interop as _pipelines_interop,
    optics as _pipelines_optics,
    quantify as _pipelines_quantify,
    segmentation as _pipelines_segmentation,
    training as _pipelines_training,
)
