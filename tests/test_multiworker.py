"""Multi-worker shared-queue e2e (round-4 verdict item 5).

Real subprocess workers under the real supervisor (`serve --workers 2`)
draining ONE jobs dir with more jobs than workers; one worker is SIGKILLed
mid-job (by exact pid — never by pattern). Asserts the whole failure-
recovery story end to end (SURVEY.md §5):

* every job reaches a terminal ``complete`` exactly once (atomic
  rename-claims = no double execution of a live claim),
* the killed worker's in-flight job is rescued by the stale-claim
  reclaimer (heartbeat stops -> any live worker re-queues it) and
  completes on a surviving/respawned worker.

This is the heavyweight companion to the fast in-process coverage in
``test_reclaim.py`` and the single-worker recycle e2e in
``test_server.py::TestSupervisorRecycleE2E``.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.server import submit_job

# the repo root, wherever this checkout lives (worker subprocesses import
# the package by cwd)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestMultiWorkerE2E:
    def test_shared_queue_drains_and_survives_sigkill(self, tmp_path):
        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        logs = tmp_path / "logs"
        for d in (jobs, models, logs):
            os.makedirs(d, exist_ok=True)
        cfgp = tmp_path / "server.json"
        # stale_claim_timeout must be << the test deadline but >> the 2 s
        # heartbeat floor (hb = min(5, 12/6) = 2 s here)
        ServerConfiguration(
            jobs_dir=str(jobs), models_dir=str(models), poll_interval=0.3,
            stale_claim_timeout=12.0, log_dir=str(logs),
        ).to_json(str(cfgp))

        # the victim: slow enough to still be running when we kill its
        # owner (its reclaimed re-run finishes in ~0.5 s — see
        # __test_slow__ in server.py)
        victim_out = tmp_path / "victim"
        submit_job(
            str(jobs),
            {"module": "__test_slow__", "params": {"sleep": 300},
             "input": [], "output": str(victim_out)},
            job_id="victim",
        )
        # quick jobs: more than the worker count so the queue is contended
        stack = np.zeros((1, 16, 16), np.float32)
        stack[0, 8, 8] = 100.0
        tiff.write_stack(str(tmp_path / "em.tif"), stack)
        quick_ids = [f"quick{i}" for i in range(4)]
        for qid in quick_ids:
            submit_job(
                str(jobs),
                {"module": "localize_emitters", "params": {"threshold": 50},
                 "input": [str(tmp_path / "em.tif")],
                 "output": str(tmp_path / qid)},
                job_id=qid,
            )

        env = dict(os.environ, SEQUITR_TEST_SLOW="1", SEQUITR_FORCE_CPU="1")
        log_f = open(tmp_path / "supervisor.log", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve", "--workers", "2",
             "--jobs-dir", str(jobs), "--models-dir", str(models),
             "--config", str(cfgp), "--poll-interval", "0.3"],
            env=env, cwd=REPO_ROOT, stdout=log_f, stderr=log_f,
        )
        try:
            # phase 1: wait for the victim to be claimed and report its pid
            # (two cold jax starts on a loaded 1-core host take a while)
            pid_file = victim_out / "worker_pid.txt"
            deadline = time.time() + 300
            while time.time() < deadline and not pid_file.exists():
                time.sleep(0.5)
            assert pid_file.exists(), (
                "victim never started: "
                + (tmp_path / "supervisor.log").read_text()[-2000:]
            )
            time.sleep(1.0)  # let the claim + first heartbeat settle
            victim_pid = int(pid_file.read_text())
            assert victim_pid != proc.pid  # a worker, not the supervisor
            os.kill(victim_pid, signal.SIGKILL)

            # phase 2: every job must land terminal-complete — the quick
            # jobs on live workers, the victim via stale-claim rescue
            def state(out_dir):
                p = out_dir / "status.json"
                if not p.exists():
                    return None
                try:
                    return json.loads(p.read_text()).get("state")
                except ValueError:
                    return None  # mid-write

            deadline = time.time() + 240
            want = [victim_out] + [tmp_path / q for q in quick_ids]
            while time.time() < deadline:
                got = [state(d) for d in want]
                if all(s == "complete" for s in got):
                    break
                time.sleep(1.0)
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert all(state(d) == "complete" for d in want), (
                [state(d) for d in want], log_txt[-3000:],
            )
            # the victim really was rescued, not just slow
            assert "reclaimed stale job" in log_txt, log_txt[-3000:]
            vstatus = json.loads((victim_out / "status.json").read_text())
            assert vstatus["outputs"]["rerun"] == "True"

            # phase 3: exactly-once terminal accounting in the ledger
            rows = [
                json.loads(line)
                for line in (logs / "jobs.jsonl").read_text().splitlines()
            ]
            done = [r["id"] for r in rows if r["state"] == "complete"]
            assert sorted(done) == sorted(["victim"] + quick_ids), rows
            # no stray claims left behind
            leftovers = [
                n for n in os.listdir(jobs) if n.endswith(".running")
            ]
            assert leftovers == [], leftovers
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
            log_f.close()


class TestMultiWorkerChainE2E:
    def test_chain_order_under_contending_workers(self, tmp_path):
        """A -> B -> C chain (submitted in REVERSE) + independent fillers,
        drained by 2 real subprocess workers: dependents never start
        before their dependency completes, even with an idle worker
        polling the queue the whole time."""
        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        logs = tmp_path / "logs"
        for d in (jobs, models, logs):
            os.makedirs(d, exist_ok=True)
        cfgp = tmp_path / "server.json"
        ServerConfiguration(
            jobs_dir=str(jobs), models_dir=str(models), poll_interval=0.2,
            log_dir=str(logs),
        ).to_json(str(cfgp))

        stack = np.zeros((1, 16, 16), np.float32)
        stack[0, 8, 8] = 100.0
        tiff.write_stack(str(tmp_path / "em.tif"), stack)

        def spec(out, depends_on=None):
            s = {
                "module": "localize_emitters",
                "params": {"threshold": 50},
                "input": [str(tmp_path / "em.tif")],
                "output": str(tmp_path / out),
            }
            if depends_on:
                s["depends_on"] = str(tmp_path / depends_on)
            return s

        # reverse submission order: the gate, not queue order, must rule
        submit_job(str(jobs), spec("c", depends_on="b"), job_id="c")
        submit_job(str(jobs), spec("b", depends_on="a"), job_id="b")
        for i in range(2):  # fillers keep the second worker busy
            submit_job(str(jobs), spec(f"fill{i}"), job_id=f"fill{i}")
        submit_job(str(jobs), spec("a"), job_id="a")

        env = dict(os.environ, SEQUITR_FORCE_CPU="1")
        log_f = open(tmp_path / "supervisor.log", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve", "--workers", "2",
             "--jobs-dir", str(jobs), "--models-dir", str(models),
             "--config", str(cfgp), "--poll-interval", "0.2"],
            env=env, cwd=REPO_ROOT, stdout=log_f, stderr=log_f,
        )
        try:
            def status(name):
                p = tmp_path / name / "status.json"
                if not p.exists():
                    return None
                try:
                    return json.loads(p.read_text())
                except ValueError:
                    return None  # mid-write

            names = ["a", "b", "c", "fill0", "fill1"]
            deadline = time.time() + 300
            while time.time() < deadline:
                got = [status(n) for n in names]
                if all(s and s.get("state") == "complete" for s in got):
                    break
                time.sleep(0.5)
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert all(
                (status(n) or {}).get("state") == "complete" for n in names
            ), ([(n, (status(n) or {}).get("state")) for n in names],
                log_txt[-3000:])
            # the gate held: each dependent started only after its
            # dependency's terminal write (same-host wall clock)
            a, b, c = status("a"), status("b"), status("c")
            assert b["started"] >= a["updated"], (a, b)
            assert c["started"] >= b["updated"], (b, c)
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
            log_f.close()
