"""Failure-interaction soak: every lifecycle feature in ONE scenario.

The individual e2e tests cover reclaim, cancel, recycle and drain in
isolation; production incidents are interactions. This scenario runs a
real supervisor with two workers over one queue and, while it drains a
mixed backlog, exercises:

* a SIGKILLed worker mid-job (stale-claim rescue, by exact pid),
* an in-flight cancel of a running job (terminal ``cancelled``),
* a final graceful drain (SIGUSR1) with jobs still queued,

then audits the aftermath: every finished job has a consistent terminal
state, the ledger agrees, the cancelled job really stopped early, the
drained-out jobs are still claimable by a NEXT supervisor which finishes
them — the queue never loses work.
"""

import json
import os
import signal
import subprocess
import sys
import time

from e2e_utils import REPO_ROOT, read_state as _state

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import jobs as jobs_lib
from sequitr_tpu.server import submit_job


class TestLifecycleSoak:
    def test_kill_cancel_drain_and_recover(self, tmp_path):
        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        logs = tmp_path / "logs"
        for d in (jobs, models, logs):
            os.makedirs(d, exist_ok=True)
        cfgp = tmp_path / "server.json"
        ServerConfiguration(
            jobs_dir=str(jobs), models_dir=str(models), poll_interval=0.2,
            stale_claim_timeout=10.0, log_dir=str(logs),
        ).to_json(str(cfgp))

        outs = {}

        def submit(jid, sleep):
            outs[jid] = tmp_path / jid
            submit_job(
                str(jobs),
                {"module": "__test_slow__", "params": {"sleep": sleep},
                 "input": [], "output": str(outs[jid])},
                job_id=jid,
            )

        # two slow jobs claim both workers; a backlog of quick ones waits
        submit("victim", 300)   # its worker gets SIGKILLed
        submit("cancelme", 300)  # cancelled in flight
        for i in range(3):
            submit(f"quick{i}", 0.1)

        env = dict(os.environ, SEQUITR_TEST_SLOW="1", SEQUITR_FORCE_CPU="1")
        log_f = open(tmp_path / "supervisor.log", "w")

        def start_supervisor():
            return subprocess.Popen(
                [sys.executable, "-m", "sequitr_tpu", "serve",
                 "--workers", "2", "--jobs-dir", str(jobs),
                 "--models-dir", str(models), "--config", str(cfgp),
                 "--poll-interval", "0.2"],
                env=env, cwd=REPO_ROOT, stdout=log_f, stderr=log_f,
            )

        proc = start_supervisor()
        try:
            # both slow jobs running (each writes its worker's pid)
            deadline = time.time() + 300
            while time.time() < deadline and not (
                (outs["victim"] / "worker_pid.txt").exists()
                and (outs["cancelme"] / "worker_pid.txt").exists()
            ):
                time.sleep(0.2)
            assert (outs["victim"] / "worker_pid.txt").exists(), (
                (tmp_path / "supervisor.log").read_text()[-2000:]
            )
            assert (outs["cancelme"] / "worker_pid.txt").exists()
            time.sleep(1.0)  # let claims + first heartbeats settle

            # 1) SIGKILL the victim's worker (exact pid, never a pattern)
            os.kill(
                int((outs["victim"] / "worker_pid.txt").read_text()),
                signal.SIGKILL,
            )
            # 2) cancel the other running job via the marker protocol
            jobs_lib.request_cancel(str(jobs), "cancelme")

            # wait: cancelme terminal-cancelled; quick jobs done; the
            # victim rescued (reclaim) and re-run to completion
            want_complete = ["victim"] + [f"quick{i}" for i in range(3)]
            deadline = time.time() + 240
            while time.time() < deadline:
                if _state(outs["cancelme"]) == "cancelled" and all(
                    _state(outs[j]) == "complete" for j in want_complete
                ):
                    break
                time.sleep(0.5)
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert _state(outs["cancelme"]) == "cancelled", (
                _state(outs["cancelme"]), log_txt[-3000:],
            )
            for j in want_complete:
                assert _state(outs[j]) == "complete", (j, log_txt[-3000:])
            # the victim really was rescued and re-run
            vst = json.loads((outs["victim"] / "status.json").read_text())
            assert vst["outputs"]["rerun"] == "True"

            # 3) drain with fresh jobs queued: they must survive untouched.
            # Occupy BOTH workers with slow holds first — the drain flag
            # must be set while they are busy, or an idle worker could
            # legitimately claim a leftover in the signal-propagation
            # window (poll_once only re-checks the flag before claims)
            submit("hold0", 20)
            submit("hold1", 20)

            def both_holds_running():
                return all(
                    (outs[h] / "worker_pid.txt").exists()
                    and _state(outs[h]) == "running"
                    for h in ("hold0", "hold1")
                )

            deadline = time.time() + 240
            while time.time() < deadline and not both_holds_running():
                time.sleep(0.2)
            assert both_holds_running(), (
                (tmp_path / "supervisor.log").read_text()[-2000:]
            )
            submit("leftover0", 0.1)
            submit("leftover1", 0.1)
            proc.send_signal(signal.SIGUSR1)
            code = proc.wait(timeout=180)
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert code == 0, log_txt[-3000:]
            for j in ("hold0", "hold1"):
                assert _state(outs[j]) == "complete", (j, log_txt[-3000:])
            for j in ("leftover0", "leftover1"):
                assert _state(outs[j]) is None  # never claimed
            # queue holds exactly the two leftover specs, no litter
            names = sorted(os.listdir(jobs))
            assert names == [
                "job_leftover0.json", "job_leftover1.json"
            ], names

            # 4) a NEXT supervisor finishes what the drained one left
            proc = start_supervisor()
            deadline = time.time() + 300
            while time.time() < deadline and not all(
                _state(outs[j]) == "complete"
                for j in ("leftover0", "leftover1")
            ):
                time.sleep(0.5)
            for j in ("leftover0", "leftover1"):
                assert _state(outs[j]) == "complete"

            # 5) ledger audit: one terminal row per finished job id, and
            # states agree with the status markers
            rows = [
                json.loads(line)
                for line in (logs / "jobs.jsonl").read_text().splitlines()
            ]
            terminal = {}
            for r in rows:
                terminal.setdefault(r["id"], []).append(r["state"])
            assert sorted(terminal) == sorted(outs), (terminal, sorted(outs))
            for jid, states in terminal.items():
                want = "cancelled" if jid == "cancelme" else "complete"
                assert states.count(want) == 1, (jid, states)
        finally:
            if proc.poll() is None:
                proc.terminate()
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
            log_f.close()
