"""Graceful drain (SIGUSR1): finish the running job, leave the queue, exit.

The rolling-restart story: SIGTERM/SIGKILL abandon the running job to the
stale-claim reclaimer (it re-runs from scratch); SIGUSR1 lets an operator
replace a server without losing work — the worker finishes its current
job, does NOT claim the next one, and exits 0. The supervisor
(``serve --workers N``) forwards the signal to every worker and stops
respawning. Real-subprocess e2e, signals sent by exact pid.
"""

import os
import signal
import subprocess
import sys
import time

from e2e_utils import REPO_ROOT, read_state as _read_state

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import submit_job


class TestDrainUnits:
    def test_poll_once_never_claims_after_drain_flag(self, tmp_path):
        """A drain landing during the (possibly long) reclaim/scan phase
        must not claim one more job: poll_once re-checks the flag before
        every claim."""
        from sequitr_tpu.server import ImageServer
        from sequitr_tpu.server.server import PipelineRegistry

        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
        )
        cfg.ensure_dirs()
        submit_job(cfg.jobs_dir, {"module": "m", "output": ""}, job_id="q1")
        srv = ImageServer(cfg, PipelineRegistry())
        srv._draining = True
        assert srv.poll_once() is False
        assert sorted(os.listdir(cfg.jobs_dir)) == ["job_q1.json"]


class TestDrainCLI:
    def test_drain_without_server_fails_cleanly(self, tmp_path, capsys):
        from sequitr_tpu.__main__ import main as cli_main

        jobs = tmp_path / "jobs"
        jobs.mkdir()
        assert cli_main(["drain", "--jobs-dir", str(jobs)]) == 1
        assert "no serve process" in capsys.readouterr().err

    def test_drain_stale_pidfile_cleaned(self, tmp_path, capsys):
        from sequitr_tpu.__main__ import main as cli_main

        jobs = tmp_path / "jobs"
        jobs.mkdir()
        # a pid that cannot exist (beyond pid_max) = a crashed serve
        (jobs / ".serve.pid").write_text("99999999")
        assert cli_main(["drain", "--jobs-dir", str(jobs)]) == 1
        assert "stale pidfile" in capsys.readouterr().err
        assert not (jobs / ".serve.pid").exists()

    def test_drain_never_signals_a_recycled_pid(self, tmp_path, capsys):
        """A SIGKILLed serve leaves its pidfile; if the pid is later owned
        by an UNRELATED process (default SIGUSR1 action: terminate), drain
        must refuse rather than kill a bystander."""
        from sequitr_tpu.__main__ import main as cli_main

        jobs = tmp_path / "jobs"
        jobs.mkdir()
        # this very test process is alive but is not a serve process
        (jobs / ".serve.pid").write_text(str(os.getpid()))
        assert cli_main(["drain", "--jobs-dir", str(jobs)]) == 1
        assert "not a sequitr_tpu serve" in capsys.readouterr().err
        assert not (jobs / ".serve.pid").exists()


class TestDrainE2E:
    def test_sigusr1_finishes_job_leaves_queue_exits_zero(self, tmp_path):
        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        os.makedirs(jobs, exist_ok=True)
        slow_out = tmp_path / "slow"
        queued_out = tmp_path / "queued"
        # the running job: slow enough to still be in flight at drain time
        submit_job(
            str(jobs),
            {"module": "__test_slow__", "params": {"sleep": 12},
             "input": [], "output": str(slow_out)},
            job_id="slowj",
        )
        # a second job behind it: must stay QUEUED through the drain
        submit_job(
            str(jobs),
            {"module": "__test_slow__", "params": {"sleep": 0.1},
             "input": [], "output": str(queued_out)},
            job_id="afterj",
        )
        env = dict(os.environ, SEQUITR_TEST_SLOW="1", SEQUITR_FORCE_CPU="1")
        log_f = open(tmp_path / "server.log", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve",
             "--jobs-dir", str(jobs), "--models-dir", str(models),
             "--poll-interval", "0.2"],
            env=env, cwd=REPO_ROOT, stdout=log_f, stderr=log_f,
        )
        try:
            # wait until the slow job is genuinely running
            deadline = time.time() + 240
            pid_file = slow_out / "worker_pid.txt"
            while time.time() < deadline and not pid_file.exists():
                time.sleep(0.2)
            assert pid_file.exists(), (
                (tmp_path / "server.log").read_text()[-2000:]
            )
            # drain through the CLI (pidfile discovery + SIGUSR1 + --wait)
            cli = subprocess.run(
                [sys.executable, "-m", "sequitr_tpu", "drain",
                 "--jobs-dir", str(jobs), "--wait", "--timeout", "120"],
                cwd=REPO_ROOT, capture_output=True, text=True, timeout=150,
            )
            assert cli.returncode == 0, (cli.stdout, cli.stderr)
            assert "drain requested" in cli.stdout and "drained" in cli.stdout
            code = proc.wait(timeout=30)
            assert code == 0
            assert not (jobs / ".serve.pid").exists()  # pidfile cleaned up
            # the in-flight job finished normally...
            assert _read_state(slow_out) == "complete"
            # ...and the queued one was never claimed
            assert _read_state(queued_out) is None
            names = sorted(os.listdir(jobs))
            assert names == ["job_afterj.json"], names
            log_txt = (tmp_path / "server.log").read_text()
            assert "drain requested" in log_txt and "drained" in log_txt
        finally:
            if proc.poll() is None:
                proc.terminate()
                proc.wait(timeout=30)
            log_f.close()

    def test_supervisor_forwards_drain_to_workers(self, tmp_path):
        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        os.makedirs(jobs, exist_ok=True)
        slow_out = tmp_path / "slow"
        submit_job(
            str(jobs),
            {"module": "__test_slow__", "params": {"sleep": 12},
             "input": [], "output": str(slow_out)},
            job_id="slowj",
        )
        env = dict(os.environ, SEQUITR_TEST_SLOW="1", SEQUITR_FORCE_CPU="1")
        log_f = open(tmp_path / "supervisor.log", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve", "--workers", "2",
             "--jobs-dir", str(jobs), "--models-dir", str(models),
             "--poll-interval", "0.2"],
            env=env, cwd=REPO_ROOT, stdout=log_f, stderr=log_f,
        )
        try:
            deadline = time.time() + 300
            pid_file = slow_out / "worker_pid.txt"
            while time.time() < deadline and not pid_file.exists():
                time.sleep(0.2)
            assert pid_file.exists(), (
                (tmp_path / "supervisor.log").read_text()[-2000:]
            )
            proc.send_signal(signal.SIGUSR1)
            code = proc.wait(timeout=180)
            assert code == 0
            assert _read_state(slow_out) == "complete"
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert "all workers drained" in log_txt, log_txt[-2000:]
            # no claims left behind
            leftovers = [
                n for n in os.listdir(jobs) if not n.endswith(".json")
            ]
            assert leftovers == [], leftovers
        finally:
            if proc.poll() is None:
                proc.terminate()
                proc.wait(timeout=30)
            log_f.close()
