"""Filesystem job queue: schema, atomic claim/complete/fail transitions.

The reference's public contract is a watched job directory: clients drop a
JSON job description; the server picks it up, runs the named pipeline and
writes results + a completion marker back (SURVEY.md §1 L6, §3.1). The
reference schema is unavailable, so the rebuild's documented job schema is:

    {
      "module": "segmentation_unet2d",   # pipeline registry key (required)
      "func":   "infer",                  # optional sub-operation
      "params": {...},                    # pipeline-specific parameters
      "input":  ["relative/or/abs.tif"],  # input data paths
      "output": "results/"                # output directory
    }

filed as ``<jobs_dir>/job_<id>.json``. Lifecycle markers inside the job's
output directory: ``status.json`` with state running/complete/failed (+
timing, error traceback). All queue transitions are atomic
write-temp-then-rename so a crashed server never leaves half-parsed jobs
(SURVEY.md §5 'Race detection': atomic fs ops replace the reference's
single-threaded assumption).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import tempfile
import time
from typing import Any, Dict, List, Optional, Tuple

log = logging.getLogger("sequitr_tpu.jobs")

__all__ = ["Job", "JobError", "scan_jobs", "claim_job", "write_status", "submit_job"]

JOB_PREFIX = "job_"
JOB_SUFFIX = ".json"
CLAIMED_SUFFIX = ".running"


class JobError(RuntimeError):
    pass


@dataclasses.dataclass
class Job:
    id: str
    module: str
    func: str
    params: Dict[str, Any]
    input: List[str]
    output: str
    priority: int = 0  # higher runs first; ties oldest-first
    path: str = ""  # queue file path once claimed

    @classmethod
    def from_file(cls, path: str) -> "Job":
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            raise JobError(f"job {path}: spec must be a JSON object")
        if "module" not in data:
            raise JobError(f"job {path} missing required field 'module'")
        stem = os.path.basename(path)
        for suffix in (CLAIMED_SUFFIX, JOB_SUFFIX):
            if stem.endswith(suffix):
                stem = stem[: -len(suffix)]
        if stem.startswith(JOB_PREFIX):
            stem = stem[len(JOB_PREFIX) :]
        try:
            # any malformed field (priority: null, input: 5, ...) must
            # surface as JobError so the server quarantines instead of
            # crashing its poll loop
            return cls(
                id=str(data.get("id", stem)),
                module=str(data["module"]),
                func=str(data.get("func") or "run"),
                params=dict(data.get("params") or {}),
                input=list(data.get("input") or []),
                output=str(data.get("output") or ""),
                priority=int(data.get("priority") or 0),
                path=path,
            )
        except (TypeError, ValueError) as e:
            raise JobError(f"job {path}: malformed field: {e}")


def _atomic_write(path: str, text: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def submit_job(jobs_dir: str, spec: Dict[str, Any], job_id: Optional[str] = None) -> str:
    """Client-side: atomically file a job JSON into the queue; returns its id.

    Auto-generated ids are timestamp-based; two submissions in the same
    millisecond (or from two clients) must not overwrite each other, so the
    queue file is created with link(2) — atomic and exclusive — retrying
    with a suffix on collision.
    """
    text = json.dumps(spec, indent=2)
    if job_id is not None:
        path = os.path.join(jobs_dir, f"{JOB_PREFIX}{job_id}{JOB_SUFFIX}")
        _atomic_write(path, text)
        return job_id
    os.makedirs(jobs_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=jobs_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        base = int(time.time() * 1000)
        for n in range(10000):
            job_id = f"{base:x}" if n == 0 else f"{base:x}-{n:x}"
            path = os.path.join(jobs_dir, f"{JOB_PREFIX}{job_id}{JOB_SUFFIX}")
            try:
                os.link(tmp, path)  # atomic exclusive create
                return job_id
            except FileExistsError:
                continue
        raise JobError(f"could not find a free job id in {jobs_dir}")
    finally:
        os.unlink(tmp)


# priority cache for scan_jobs: path -> (mtime, priority). Queued files are
# immutable once submitted (atomic create), so one parse per file suffices;
# without this a long backlog would be re-opened and re-JSON-parsed on
# every poll tick.
_prio_cache: Dict[str, Tuple[float, int]] = {}


def scan_jobs(jobs_dir: str) -> List[str]:
    """Unclaimed job files: highest priority first, oldest first within a
    priority level (priority is the job JSON's optional ``priority`` int,
    default 0 — an unparseable file sorts as 0 and is quarantined at claim
    time).

    A concurrent claimer (or a client withdrawing a job) may rename/delete a
    file between the directory scan and the stat — such entries are skipped
    rather than letting FileNotFoundError kill the server poll loop.
    """
    entries = []
    seen = set()
    try:
        with os.scandir(jobs_dir) as it:
            for e in it:
                if not (e.name.startswith(JOB_PREFIX) and e.name.endswith(JOB_SUFFIX)):
                    continue
                try:
                    mtime = e.stat().st_mtime
                except FileNotFoundError:
                    continue  # vanished mid-scan: someone else claimed it
                seen.add(e.path)
                cached = _prio_cache.get(e.path)
                if cached is not None and cached[0] == mtime:
                    prio = cached[1]
                else:
                    prio = 0
                    try:
                        with open(e.path) as f:
                            prio = int(json.load(f).get("priority") or 0)
                    except (OSError, ValueError, TypeError, AttributeError):
                        pass  # malformed: claim-time quarantine handles it
                    _prio_cache[e.path] = (mtime, prio)
                entries.append((-prio, mtime, e.path))
    except FileNotFoundError:
        return []
    # drop cache entries for files no longer queued (claimed/removed)
    for stale in set(_prio_cache) - seen:
        _prio_cache.pop(stale, None)
    return [p for _, _, p in sorted(entries)]


def claim_job(path: str) -> Optional[Job]:
    """Atomically claim a queued job by renaming it; None if already taken.

    Only FileNotFoundError is the benign claim-race case. Any other OSError
    (e.g. EACCES on the queue dir) is logged loudly — swallowing it silently
    would make every job invisible while the server rescans the same file
    forever.
    """
    claimed = path[: -len(JOB_SUFFIX)] + CLAIMED_SUFFIX
    try:
        os.rename(path, claimed)
    except FileNotFoundError:
        return None
    except OSError as e:
        log.error("cannot claim job %s: %s", path, e)
        return None
    job = Job.from_file(claimed)
    job.path = claimed
    return job


def write_status(
    job: Job,
    state: str,
    started: float,
    error: Optional[str] = None,
    outputs: Optional[Dict[str, str]] = None,
) -> None:
    """Atomically write the job's status marker into its output directory."""
    status = {
        "id": job.id,
        "module": job.module,
        "func": job.func,
        "state": state,
        "started": started,
        "updated": time.time(),
        "elapsed_s": round(time.time() - started, 3),
    }
    if error is not None:
        status["error"] = error
    if outputs is not None:
        status["outputs"] = outputs
    out_dir = job.output or os.path.dirname(job.path)
    _atomic_write(os.path.join(out_dir, "status.json"), json.dumps(status, indent=2))
