"""Job chaining: ``depends_on`` output-dir dependencies.

Contract under test (server/jobs.py check_dependencies + server poll gate):
a queued job whose ``depends_on`` dirs lack a complete status.json stays
queued untouched; it runs once every dependency completes; a
failed/cancelled dependency (or a ``dep_timeout`` expiry) fails it
deterministically with the normal terminal artifacts, cascading through
chains. Dependencies are directories — the same filesystem contract
clients poll — so chains survive server restarts with no extra state.
"""

import json
import os
import time

import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.server import ImageServer, submit_job
from sequitr_tpu.server import jobs as jobs_lib


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"),
        models_dir=str(tmp_path / "models"),
        log_dir=str(tmp_path / "logs"),
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def write_state(out_dir: str, state: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "status.json"), "w") as f:
        json.dump({"id": "x", "state": state}, f)


def queued_path(cfg, jid: str) -> str:
    return os.path.join(cfg.jobs_dir, f"job_{jid}.json")


def tiny_stack(tmp, name="stack.tif", n=3):
    rng = np.random.default_rng(0)
    p = str(tmp / name)
    tiff.write_stack(p, (rng.random((n, 16, 16)) * 900).astype(np.uint16))
    return p


class TestCheckDependencies:
    def test_no_deps_ready(self, server_env):
        cfg, tmp = server_env
        jid = submit_job(cfg.jobs_dir, {"module": "m", "output": "o"})
        assert jobs_lib.check_dependencies(queued_path(cfg, jid)) == (
            "ready",
            None,
        )

    def test_missing_then_complete(self, server_env):
        cfg, tmp = server_env
        dep = str(tmp / "depout")
        jid = submit_job(
            cfg.jobs_dir, {"module": "m", "output": "o", "depends_on": dep}
        )
        p = queued_path(cfg, jid)
        state, detail = jobs_lib.check_dependencies(p)
        assert state == "wait" and detail == dep
        write_state(dep, "running")
        assert jobs_lib.check_dependencies(p)[0] == "wait"
        write_state(dep, "complete")
        assert jobs_lib.check_dependencies(p) == ("ready", None)

    @pytest.mark.parametrize("bad", ["failed", "cancelled"])
    def test_terminal_dep_fails(self, server_env, bad):
        cfg, tmp = server_env
        dep = str(tmp / "depout")
        write_state(dep, bad)
        jid = submit_job(
            cfg.jobs_dir, {"module": "m", "output": "o", "depends_on": [dep]}
        )
        state, reason = jobs_lib.check_dependencies(queued_path(cfg, jid))
        assert state == "fail"
        assert dep in reason and bad in reason

    def test_multiple_deps_all_must_complete(self, server_env):
        cfg, tmp = server_env
        a, b = str(tmp / "a"), str(tmp / "b")
        write_state(a, "complete")
        jid = submit_job(
            cfg.jobs_dir,
            {"module": "m", "output": "o", "depends_on": [a, b]},
        )
        p = queued_path(cfg, jid)
        assert jobs_lib.check_dependencies(p) == ("wait", b)
        write_state(b, "complete")
        assert jobs_lib.check_dependencies(p) == ("ready", None)

    def test_dep_timeout_expiry(self, server_env):
        cfg, tmp = server_env
        dep = str(tmp / "never")
        jid = submit_job(
            cfg.jobs_dir,
            {
                "module": "m",
                "output": "o",
                "depends_on": dep,
                "dep_timeout": 5.0,
            },
        )
        p = queued_path(cfg, jid)
        assert jobs_lib.check_dependencies(p)[0] == "wait"
        # backdate the submission: the wait clock is the queue file mtime
        past = time.time() - 60
        os.utime(p, (past, past))
        state, reason = jobs_lib.check_dependencies(p)
        assert state == "fail" and "dep_timeout" in reason

    def test_garbage_status_means_wait(self, server_env):
        cfg, tmp = server_env
        dep = str(tmp / "depout")
        os.makedirs(dep)
        with open(os.path.join(dep, "status.json"), "w") as f:
            f.write("{not json")
        jid = submit_job(
            cfg.jobs_dir, {"module": "m", "output": "o", "depends_on": dep}
        )
        # a half-written status (the writer is atomic, but be defensive)
        # reads as not-finished-yet, never as a crash or a false fail
        assert jobs_lib.check_dependencies(queued_path(cfg, jid))[0] == "wait"


class TestServerGate:
    def test_waiting_job_stays_queued(self, server_env):
        cfg, tmp = server_env
        dep = str(tmp / "depout")
        jid = submit_job(
            cfg.jobs_dir,
            {"module": "noop", "output": str(tmp / "o"), "depends_on": dep},
        )
        srv = ImageServer(cfg)
        assert srv.poll_once() is False  # nothing claimable
        assert os.path.exists(queued_path(cfg, jid))  # untouched, queued

    def test_runs_after_dependency_completes(self, server_env):
        cfg, tmp = server_env
        dep = str(tmp / "depout")
        stack = tiny_stack(tmp)
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"estimate_only": True},
                "input": [stack],
                "output": out,
                "depends_on": dep,
            },
        )
        srv = ImageServer(cfg)
        assert srv.poll_once() is False
        write_state(dep, "complete")
        assert srv.poll_once() is True
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "complete"

    def test_failed_dependency_cascades(self, server_env):
        """A -> B -> C: A failed; polling fails B, then C, each with the
        normal terminal artifacts (status.json, .failed marker, ledger)."""
        cfg, tmp = server_env
        a, b_out, c_out = str(tmp / "a"), str(tmp / "b"), str(tmp / "c")
        write_state(a, "failed")
        jb = submit_job(
            cfg.jobs_dir,
            {"module": "noop", "output": b_out, "depends_on": a},
        )
        jc = submit_job(
            cfg.jobs_dir,
            {"module": "noop", "output": c_out, "depends_on": b_out},
        )
        srv = ImageServer(cfg)
        # one sweep fails B (dep terminal) — C may fail in the same or the
        # next sweep depending on scan order; give it two
        srv.poll_once()
        srv.poll_once()
        for jid, out, dep in ((jb, b_out, a), (jc, c_out, b_out)):
            status = json.load(open(os.path.join(out, "status.json")))
            assert status["state"] == "failed"
            assert dep in status["error"]
            # claim renames job_X.json -> job_X.running; fail appends .failed
            marker = os.path.join(cfg.jobs_dir, f"job_{jid}.running.failed")
            assert os.path.exists(marker), os.listdir(cfg.jobs_dir)
        ledger = [
            json.loads(line)
            for line in open(os.path.join(cfg.log_dir, "jobs.jsonl"))
        ]
        assert {r["id"] for r in ledger} == {jb, jc}
        assert all(r["state"] == "failed" for r in ledger)

    def test_waiting_job_does_not_block_others(self, server_env):
        cfg, tmp = server_env
        stack = tiny_stack(tmp)
        out_blocked = str(tmp / "blocked")
        out_free = str(tmp / "free")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"estimate_only": True},
                "input": [stack],
                "output": out_blocked,
                "depends_on": str(tmp / "never"),
                "priority": 10,  # even at higher priority
            },
        )
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"estimate_only": True},
                "input": [stack],
                "output": out_free,
            },
        )
        assert ImageServer(cfg).poll_once() is True
        assert os.path.exists(os.path.join(out_free, "status.json"))
        assert not os.path.exists(os.path.join(out_blocked, "status.json"))

    def test_cancel_waiting_job(self, server_env):
        from sequitr_tpu.client import cancel_job

        cfg, tmp = server_env
        jid = submit_job(
            cfg.jobs_dir,
            {
                "module": "noop",
                "output": str(tmp / "o"),
                "depends_on": str(tmp / "never"),
            },
        )
        assert cancel_job(cfg.jobs_dir, jid) == "cancelled"
        assert ImageServer(cfg).poll_once() is False

    @pytest.mark.parametrize(
        "spec_extra",
        [
            {"depends_on": 5},  # scalar non-string
            {"depends_on": [5]},  # non-string list entry
            {"depends_on": [None]},
            {"depends_on": "dir", "dep_timeout": "abc"},  # bad timeout
        ],
    )
    def test_malformed_depends_on_quarantined(self, server_env, spec_extra):
        """Every malformed-spec shape must reach claim-time quarantine —
        never be half-honored into an unbounded wait (e.g. a bad
        dep_timeout silently dropped while its depends_on is obeyed)."""
        cfg, tmp = server_env
        jid = submit_job(
            cfg.jobs_dir,
            dict({"module": "noop", "output": str(tmp / "o")}, **spec_extra),
        )
        srv = ImageServer(cfg)
        srv.poll_once()
        assert os.path.exists(queued_path(cfg, jid) + ".rejected")

    def test_self_dependency_fails_immediately(self, server_env):
        """A job waiting on its OWN output dir can never become ready;
        it must fail terminally, not deadlock the queue."""
        cfg, tmp = server_env
        out = str(tmp / "self")
        jid = submit_job(
            cfg.jobs_dir,
            {
                "module": "noop",
                "output": out,
                # non-normalized spelling of the same dir still counts
                "depends_on": [str(tmp / "x" / ".." / "self")],
            },
        )
        ImageServer(cfg).poll_once()
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "failed"
        assert "own output" in status["error"]
        assert not os.path.exists(queued_path(cfg, jid))

    def test_cancel_queued_dependency_cascades(self, server_env):
        """Cancelling a STILL-QUEUED dependency must leave the same
        terminal record as cancelling a running one — a cancelled
        status.json — so dependents fail instead of waiting forever."""
        from sequitr_tpu.client import cancel_job

        cfg, tmp = server_env
        a_out, b_out = str(tmp / "a"), str(tmp / "b")
        ja = submit_job(
            cfg.jobs_dir, {"module": "noop", "output": a_out}
        )
        submit_job(
            cfg.jobs_dir,
            {"module": "noop", "output": b_out, "depends_on": a_out},
        )
        assert cancel_job(cfg.jobs_dir, ja) == "cancelled"
        status_a = json.load(open(os.path.join(a_out, "status.json")))
        assert status_a["state"] == "cancelled"
        assert status_a["id"] == ja
        ImageServer(cfg).poll_once()
        status_b = json.load(open(os.path.join(b_out, "status.json")))
        assert status_b["state"] == "failed"
        assert a_out in status_b["error"]


class TestChainE2E:
    def test_register_then_estimate_chain(self, server_env):
        """Submit the whole chain up front: drift-correct a stack, then —
        gated on its completion — re-estimate drift on the OUTPUT; the
        residual trajectory of a registered stack is ~zero."""
        cfg, tmp = server_env
        rng = np.random.default_rng(1)
        f = np.fft.fft2(rng.normal(0, 1, (48, 48)))
        fy = np.fft.fftfreq(48)[:, None]
        fx = np.fft.fftfreq(48)[None, :]
        base = (
            np.fft.ifft2(f * np.exp(-(fy**2 + fx**2) / (2 * 0.08**2))).real
            * 50
            + 120
        ).astype(np.float32)
        import jax.numpy as jnp

        from sequitr_tpu.ops import registration as reg

        frames = [
            np.asarray(
                reg.apply_shift(jnp.asarray(base), jnp.asarray([1.1 * t, -0.7 * t]))
            )
            for t in range(4)
        ]
        stack = str(tmp / "drifting.tif")
        tiff.write_stack(stack, np.stack(frames))
        out_a = str(tmp / "registered")
        out_b = str(tmp / "residual")
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "input": [stack],
                "output": out_a,
            },
        )
        submit_job(
            cfg.jobs_dir,
            {
                "module": "register_stack",
                "params": {"estimate_only": True},
                "input": [os.path.join(out_a, "registered.tif")],
                "output": out_b,
                "depends_on": out_a,
            },
        )
        srv = ImageServer(cfg)
        assert srv.poll_once() is True  # runs A (B is gated)
        assert srv.poll_once() is True  # runs B
        resid = np.loadtxt(
            os.path.join(out_b, "shifts.csv"),
            delimiter=",",
            skiprows=1,
            usecols=(1, 2),
        )
        assert np.abs(resid).max() < 0.05  # the chain's output is stationary
