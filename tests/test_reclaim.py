"""Stale-claim reclaim + heartbeat (round-4: orphaned-job rescue).

A worker killed hard (SIGKILL, OOM, host crash) leaves its claimed job as
``.running`` litter no scan revisits — without rescue the queue silently
loses it (SURVEY.md §5 failure detection). Workers heartbeat their claimed
file's mtime while the job runs; any live worker's poll tick re-queues
claims whose heartbeat stopped for longer than ``stale_claim_timeout``.
The multi-worker shared-queue e2e (real subprocess workers, one of them
SIGKILLed mid-job) lives in ``test_multiworker.py``.
"""

import json
import os
import threading
import time


from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import ImageServer, submit_job
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server.server import PipelineRegistry


def _orphan_claim(jobs_dir: str, job_id: str, spec: dict, age_s: float) -> str:
    """Plant a claimed job whose owner 'died' ``age_s`` seconds ago."""
    path = os.path.join(
        jobs_dir, f"{jobs_lib.JOB_PREFIX}{job_id}{jobs_lib.CLAIMED_SUFFIX}"
    )
    os.makedirs(jobs_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(spec, f)
    old = time.time() - age_s
    os.utime(path, (old, old))
    return path


class TestReclaimPrimitives:
    def test_claim_stamps_mtime(self, tmp_path):
        """A claim resets the heartbeat clock: a job queued for an hour must
        not look instantly orphaned (rename preserves the submit mtime)."""
        jobs_dir = str(tmp_path)
        submit_job(jobs_dir, {"module": "m", "output": str(tmp_path / "o")},
                   job_id="aged")
        qpath = os.path.join(jobs_dir, "job_aged.json")
        old = time.time() - 3600
        os.utime(qpath, (old, old))
        job = jobs_lib.claim_job(qpath)
        assert job is not None
        assert time.time() - os.stat(job.path).st_mtime < 30

    def test_heartbeat_refreshes_mtime(self, tmp_path):
        path = _orphan_claim(str(tmp_path), "hb", {"module": "m"}, age_s=500)
        job = jobs_lib.Job.from_file(path)
        job.path = path
        assert time.time() - os.stat(path).st_mtime > 400
        jobs_lib.heartbeat(job)
        assert time.time() - os.stat(path).st_mtime < 30

    def test_heartbeat_on_vanished_claim_is_harmless(self, tmp_path):
        job = jobs_lib.Job(id="x", module="m", func="run", params={},
                           input=[], output="", path=str(tmp_path / "gone"))
        jobs_lib.heartbeat(job)  # no raise

    def test_reclaim_requeues_stale_leaves_fresh(self, tmp_path):
        jobs_dir = str(tmp_path)
        stale = _orphan_claim(jobs_dir, "dead", {"module": "m"}, age_s=100)
        fresh = _orphan_claim(jobs_dir, "alive", {"module": "m"}, age_s=1)
        got = jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0)
        assert got == [os.path.join(jobs_dir, "job_dead.json")]
        assert os.path.exists(got[0]) and not os.path.exists(stale)
        assert os.path.exists(fresh)  # owner still beating: untouched
        # idempotent: a second sweep finds nothing left to rescue
        assert jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0) == []

    def test_reclaim_missing_dir(self, tmp_path):
        assert jobs_lib.reclaim_stale_claims(str(tmp_path / "nope"), 1.0) == []

    def test_reclaimed_job_is_claimable(self, tmp_path):
        jobs_dir = str(tmp_path)
        _orphan_claim(jobs_dir, "dead", {"module": "m", "params": {"x": 1}},
                      age_s=100)
        (requeued,) = jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0)
        assert jobs_lib.scan_jobs(jobs_dir) == [requeued]
        job = jobs_lib.claim_job(requeued)
        assert job is not None and job.id == "dead" and job.params == {"x": 1}

    def test_queue_file_mtime_is_fresh_even_without_post_rename_stamp(
        self, tmp_path, monkeypatch
    ):
        """The heartbeat clock is stamped on the QUEUE file before the
        claim rename (rename preserves mtime), so there is no window in
        which an hour-old submission exists as an instantly-stale .running
        file a concurrent reclaimer could yank back mid-claim."""
        jobs_dir = str(tmp_path)
        submit_job(jobs_dir, {"module": "m"}, job_id="aged2")
        qpath = os.path.join(jobs_dir, "job_aged2.json")
        old = time.time() - 3600
        os.utime(qpath, (old, old))
        real_utime = os.utime

        def utime_queue_only(path, *a, **kw):
            if path.endswith(jobs_lib.CLAIMED_SUFFIX):
                raise OSError("simulated: post-rename stamp lost")
            return real_utime(path, *a, **kw)

        monkeypatch.setattr(os, "utime", utime_queue_only)
        job = jobs_lib.claim_job(qpath)
        assert job is not None
        assert time.time() - os.stat(job.path).st_mtime < 30

    def test_reclaim_never_clobbers_resubmitted_spec(self, tmp_path):
        """A stale claim whose id was re-submitted with a corrected spec is
        DROPPED, not renamed over the fresh queue file (rename clobbers;
        the reclaimer must not replace the corrected spec with the old
        one)."""
        jobs_dir = str(tmp_path)
        _orphan_claim(jobs_dir, "fix", {"module": "m", "params": {"v": "old"}},
                      age_s=100)
        submit_job(jobs_dir, {"module": "m", "params": {"v": "new"}},
                   job_id="fix")
        got = jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0)
        assert got == []  # superseded, not reclaimed
        qpath = os.path.join(jobs_dir, "job_fix.json")
        assert json.load(open(qpath))["params"] == {"v": "new"}
        assert [n for n in os.listdir(jobs_dir)] == ["job_fix.json"]

    def test_orphaned_reclaim_tmp_is_swept(self, tmp_path):
        """A reclaimer that crashed between its rename and the requeue
        leaves a .reclaim tmp; a later sweep finishes the transition."""
        jobs_dir = str(tmp_path)
        tmp = os.path.join(jobs_dir, f"job_crash{jobs_lib.RECLAIM_SUFFIX}")
        with open(tmp, "w") as f:
            json.dump({"module": "m"}, f)
        old = time.time() - 100
        os.utime(tmp, (old, old))
        got = jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0)
        assert got == [os.path.join(jobs_dir, "job_crash.json")]
        assert os.path.exists(got[0]) and not os.path.exists(tmp)


class TestClaimOwnership:
    def test_owns_claim_lifecycle(self, tmp_path):
        jobs_dir = str(tmp_path)
        submit_job(jobs_dir, {"module": "m"}, job_id="own")
        job = jobs_lib.claim_job(os.path.join(jobs_dir, "job_own.json"))
        assert jobs_lib.owns_claim(job)
        jobs_lib.heartbeat(job)
        assert jobs_lib.owns_claim(job)
        # another worker re-claimed after a reclaim: its stamp is far newer
        # than our last beat
        future = time.time() + 300
        os.utime(job.path, (future, future))
        assert not jobs_lib.owns_claim(job)
        # claim vanished entirely (reclaimed, still queued): not ours
        os.unlink(job.path)
        assert not jobs_lib.owns_claim(job)

    def test_heartbeat_never_restamps_a_stolen_claim(self, tmp_path):
        """A worker that starved past the stale timeout must STAY
        disowned: its next heartbeat must not re-stamp the file another
        worker now owns (that would corrupt the new owner's liveness
        signal and flip owns_claim back to True)."""
        jobs_dir = str(tmp_path)
        submit_job(jobs_dir, {"module": "m"}, job_id="steal")
        job = jobs_lib.claim_job(os.path.join(jobs_dir, "job_steal.json"))
        # another worker re-claimed after a reclaim: far-newer stamp
        future = time.time() + 300
        os.utime(job.path, (future, future))
        assert not jobs_lib.owns_claim(job)
        jobs_lib.heartbeat(job)  # must be a no-op on a stolen claim
        assert not jobs_lib.owns_claim(job)
        assert os.stat(job.path).st_mtime == future

    def test_reclaim_honors_pending_cancel(self, tmp_path):
        """Owner died AFTER a cancel was acknowledged: the reclaim must
        land the job in terminal 'cancelled', not silently re-run it."""
        jobs_dir = str(tmp_path / "jobs")
        out = tmp_path / "out"
        _orphan_claim(
            jobs_dir, "dead",
            {"module": "m", "output": str(out)}, age_s=100,
        )
        jobs_lib.request_cancel(jobs_dir, "dead")
        got = jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0)
        assert got == []  # cancelled, not requeued
        assert os.listdir(jobs_dir) == []  # claim + marker both consumed
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "cancelled"
        assert "honored at reclaim" in st["error"]

    def test_orphaned_tmp_with_pending_cancel_is_cancelled(self, tmp_path):
        jobs_dir = str(tmp_path / "jobs")
        out = tmp_path / "out"
        os.makedirs(jobs_dir)
        tmp = os.path.join(jobs_dir, f"job_c1{jobs_lib.RECLAIM_SUFFIX}")
        with open(tmp, "w") as f:
            json.dump({"module": "m", "output": str(out)}, f)
        old = time.time() - 100
        os.utime(tmp, (old, old))
        jobs_lib.request_cancel(jobs_dir, "c1")
        assert jobs_lib.reclaim_stale_claims(jobs_dir, timeout=30.0) == []
        assert os.listdir(jobs_dir) == []
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "cancelled"

    def test_handmade_job_is_always_owned(self, tmp_path):
        job = jobs_lib.Job(id="x", module="m", func="run", params={},
                           input=[], output="", path=str(tmp_path / "f"))
        assert jobs_lib.owns_claim(job)  # last_beat == 0: not via claim_job

    def test_zombie_completion_leaves_new_owners_claim_alone(self, tmp_path):
        """The reclaim horror story: worker A is suspended past the stale
        timeout, its job is reclaimed and re-claimed by worker B, then A
        resumes and finishes. A's terminal transition must NOT delete B's
        live claim marker (that would make B's job unreclaimable if B then
        dies) and must NOT clear B's cancel marker."""
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
            stale_claim_timeout=30.0,
        )
        cfg.ensure_dirs()
        out = tmp_path / "out"
        submit_job(cfg.jobs_dir, {"module": "zomb", "output": str(out)},
                   job_id="z1")
        reg = PipelineRegistry()

        @reg.register("zomb")
        def _zomb(job, config):
            # simulate: A stalls, reclaim + B's re-claim happen mid-run
            # (same path, far-newer stamp), B also gets a cancel request
            future = time.time() + 300
            os.utime(job.path, (future, future))
            jobs_lib.request_cancel(cfg.jobs_dir, job.id)
            return {}

        srv = ImageServer(cfg, reg)
        assert srv.poll_once()
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "complete"  # A's success is kept
        claimed = os.path.join(
            cfg.jobs_dir, f"job_z1{jobs_lib.CLAIMED_SUFFIX}"
        )
        assert os.path.exists(claimed), "B's live claim marker was deleted"
        fake_b = jobs_lib.Job(id="z1", module="zomb", func="run", params={},
                              input=[], output=str(out), path=claimed)
        assert jobs_lib.cancel_requested(fake_b), (
            "B's cancel marker was cleared by the zombie"
        )


class TestReclaimServer:
    def _cfg(self, tmp_path, **kw):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models"),
            **kw,
        )
        cfg.ensure_dirs()
        return cfg

    def test_poll_rescues_orphan_and_completes_it(self, tmp_path):
        """The whole rescue: a dead worker's claimed job is re-queued on the
        next poll tick and RUNS in that same tick."""
        cfg = self._cfg(tmp_path, stale_claim_timeout=30.0)
        out = tmp_path / "out"
        _orphan_claim(
            cfg.jobs_dir, "orphan",
            {"module": "touch", "output": str(out)}, age_s=120,
        )
        reg = PipelineRegistry()

        @reg.register("touch")
        def _touch(job, config):
            return {"ok": "yes"}

        srv = ImageServer(cfg, reg)
        assert srv.poll_once()
        status = json.loads((out / "status.json").read_text())
        assert status["state"] == "complete"
        assert not any(
            n.endswith(jobs_lib.CLAIMED_SUFFIX) for n in os.listdir(cfg.jobs_dir)
        )

    def test_reclaim_disabled_leaves_orphans(self, tmp_path):
        cfg = self._cfg(tmp_path, stale_claim_timeout=None)
        path = _orphan_claim(cfg.jobs_dir, "orphan", {"module": "m"}, age_s=120)
        srv = ImageServer(cfg, PipelineRegistry())
        assert not srv.poll_once()
        assert os.path.exists(path)

    def test_live_slow_job_is_not_reclaimed(self, tmp_path):
        """A job SLOWER than stale_claim_timeout but alive keeps its claim:
        the watchdog loop heartbeats the mtime from the server thread while
        the pipeline thread works."""
        cfg = self._cfg(tmp_path, stale_claim_timeout=1.2)  # hb = 0.2 s
        out = tmp_path / "out"
        submit_job(
            cfg.jobs_dir, {"module": "slow", "output": str(out)}, job_id="slowj"
        )
        reg = PipelineRegistry()

        @reg.register("slow")
        def _slow(job, config):
            time.sleep(3.0)  # 2.5x the stale timeout
            return {}

        srv = ImageServer(cfg, reg)
        stolen = []

        def rival():
            # a concurrent worker sweeping aggressively the whole time
            end = time.time() + 4.0
            while time.time() < end:
                stolen.extend(
                    jobs_lib.reclaim_stale_claims(cfg.jobs_dir, 1.2)
                )
                time.sleep(0.1)

        t = threading.Thread(target=rival)
        t.start()
        try:
            assert srv.poll_once()
        finally:
            t.join()
        assert stolen == []
        status = json.loads((out / "status.json").read_text())
        assert status["state"] == "complete"

    def test_finished_but_reclaimed_job_stays_complete(self, tmp_path):
        """If a reclaimer steals the claim of a job that then FINISHES, the
        success is kept (at-least-once: the re-queued copy re-runs, it does
        not turn the first run into a failure)."""
        cfg = self._cfg(tmp_path, stale_claim_timeout=None)
        out = tmp_path / "out"
        submit_job(
            cfg.jobs_dir, {"module": "stolen", "output": str(out)}, job_id="s1"
        )
        reg = PipelineRegistry()
        runs = []

        @reg.register("stolen")
        def _stolen(job, config):
            runs.append(1)
            if len(runs) == 1:
                # simulate the rival's reclaim landing mid-run
                os.rename(
                    job.path,
                    job.path[: -len(jobs_lib.CLAIMED_SUFFIX)]
                    + jobs_lib.JOB_SUFFIX,
                )
            return {"run": str(len(runs))}

        srv = ImageServer(cfg, reg)
        assert srv.poll_once()
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "complete"
        # the re-queued copy is still claimable: at-least-once, not lost
        assert srv.poll_once()
        assert len(runs) == 2
        assert json.loads((out / "status.json").read_text())["state"] == "complete"
