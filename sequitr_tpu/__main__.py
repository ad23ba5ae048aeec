"""Command-line interface: ``python -m sequitr_tpu <command>``.

Commands (the operational surface of the reference's server scripts):
  serve        — run the watched-directory image server (--workers N
                 supervises one worker per chip)
  submit       — file a job JSON into a server's jobs directory
  status       — print a job's status (+ live progress; --follow tails it)
  models       — list registered models
  queue        — show pending/running/failed/rejected jobs
  cancel       — withdraw a queued job, or stop a RUNNING one at its next
                 frame/step
  drain        — graceful rolling restart: finish running jobs, leave the
                 queue, exit
  retry        — re-queue a failed job
  stats        — summarize the server's jobs.jsonl ledger
  info         — version, backend/devices, native status, pipelines
  doctor       — health report with BOUNDED backend probes (a dead
                 accelerator relay is a diagnosis, not a hang)
  import-model / export-model — weight interchange (TF/torch layouts)
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _serve_workers(args) -> int:
    """Supervise N single-claimer worker processes over one jobs dir.

    The queue's atomic rename-claims make concurrent claimers safe, so
    scaling serving across accelerators is one process per chip sharing the
    watched directory (the reference was single-process/single-GPU). Each
    worker gets SEQUITR_WORKER_ID=<i> and, with --pin-env VAR, VAR=<i>
    (e.g. TPU_VISIBLE_DEVICES) so each binds one chip. Crashed workers are
    restarted with a capped budget; SIGINT tears everyone down.
    """
    import os
    import subprocess
    import time

    base = [
        sys.executable, "-m", "sequitr_tpu", "serve",
        "--jobs-dir", args.jobs_dir, "--models-dir", args.models_dir,
        "--poll-interval", str(args.poll_interval), "--workers", "1",
    ]
    if args.config:
        base += ["--config", args.config]
    log = logging.getLogger("sequitr_tpu.supervisor")

    def spawn(i):
        env = dict(os.environ, SEQUITR_WORKER_ID=str(i))
        if args.pin_env:
            env[args.pin_env] = str(i)
        return subprocess.Popen(base, env=env)

    # SIGTERM (systemd stop, subprocess .terminate(), docker stop) must tear
    # the workers down exactly like Ctrl-C — otherwise they outlive the
    # supervisor as orphans still claiming jobs. Installed BEFORE spawning
    # so there is no startup window where a TERM orphans fresh workers.
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)

    # SIGUSR1 = graceful drain (rolling restart): forward it to every live
    # worker (each finishes its current job, then exits 0 — see
    # ImageServer.run_forever), stop respawning, and return once all have
    # left. The queue is untouched; a new supervisor picks it up.
    # procs/restarts are bound BEFORE the handler is installed (a signal
    # in the gap must not hit an unbound name), and spawn() re-forwards
    # the signal to any worker created while the drain was already on
    # (a respawn racing the handler would otherwise never hear it).
    procs = {}
    restarts = {}
    draining = {"on": False, "dirty": False}

    def spawn_tracked(i):
        p = spawn(i)
        if draining["on"]:
            try:
                p.send_signal(signal.SIGUSR1)
            except OSError:
                pass
        return p

    def _drain(signum, frame):
        draining["on"] = True
        log.info("drain requested: forwarding to workers, no respawns")
        for p in procs.values():
            if p.poll() is None:
                try:
                    p.send_signal(signal.SIGUSR1)
                except OSError:
                    pass

    try:
        signal.signal(signal.SIGUSR1, _drain)
    except (ValueError, OSError, AttributeError):
        pass

    try:
        for i in range(args.workers):
            procs[i] = spawn_tracked(i)
            restarts[i] = 0
        log.info("supervising %d workers on %s", args.workers, args.jobs_dir)
        while procs:
            for i, p in list(procs.items()):
                code = p.poll()
                if code is None:
                    continue
                if draining["on"]:
                    if code == 0:
                        log.info("worker %d drained (exit 0)", i)
                    else:
                        # a crash DURING the drain: its in-flight job was
                        # not finished (it awaits stale-claim reclaim) —
                        # the drain's exit code must not attest success
                        log.error(
                            "worker %d exited %s during drain; its job "
                            "(if any) awaits reclaim", i, code,
                        )
                        draining["dirty"] = True
                    del procs[i]
                    continue
                from sequitr_tpu.server.server import EXIT_RECYCLE

                if code == EXIT_RECYCLE:
                    # deliberate post-watchdog recycle: the worker freed its
                    # chip from a wedged job's abandoned thread. The job is
                    # already marked failed; respawn WITHOUT charging the
                    # crash budget (each recycle makes queue progress, so
                    # this cannot loop on one job).
                    log.warning("worker %d recycled after job timeout; respawning", i)
                    procs[i] = spawn_tracked(i)
                    continue
                if restarts[i] >= 3:
                    # budget spent: give this worker up for good instead of
                    # re-logging a dead Popen every tick
                    log.error("worker %d exited (%s); restart budget spent", i, code)
                    del procs[i]
                    continue
                restarts[i] += 1
                log.warning("worker %d exited (%s); restarting", i, code)
                procs[i] = spawn_tracked(i)
            time.sleep(1.0)
        if draining["on"]:
            if draining["dirty"]:
                log.error("drain finished with crashed worker(s); exit 1")
                return 1
            log.info("all workers drained; supervisor exiting")
            return 0
        log.error("all workers dead; supervisor exiting")
        return 1
    except KeyboardInterrupt:
        # a second SIGTERM during teardown must not re-raise mid-loop and
        # skip terminate()/wait() for the remaining workers (orphans) —
        # ignore further TERMs once cleanup has begun
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
        for p in procs.values():
            p.terminate()
        for p in procs.values():
            p.wait()
        return 0


def _follow_job(output_dir: str, poll: float, expect_id=None) -> int:
    """Live-tail a job: one line per progress update, final status, exit
    code from the terminal state.

    ``expect_id``: ignore status/progress rows from OTHER runs into the
    same output dir — the resume-by-resubmitting flow leaves a previous
    run's terminal status.json behind, and ``submit --follow`` must wait
    for ITS job rather than exiting with the old run's result.
    """
    import os
    import time

    path = os.path.join(output_dir, "status.json")
    ppath = os.path.join(output_dir, "progress.json")
    last_update = None
    waiting_noted = False
    while True:
        try:
            status = json.load(open(path))
        except (OSError, ValueError):
            status = None  # not started yet (or mid-write)
        if (
            status is not None and expect_id is not None
            and status.get("id") != expect_id
        ):
            status = None  # a PREVIOUS run's marker: keep waiting
        if status is None and not waiting_noted:
            # a mistyped path and a not-yet-claimed job look the same;
            # say so once instead of hanging silently forever
            print(
                f"waiting for {path} (job not started yet, or wrong "
                "output dir?)", file=sys.stderr,
            )
            waiting_noted = True
        try:
            prog = json.load(open(ppath))
        except (OSError, ValueError):
            prog = None
        if prog and expect_id is not None and prog.get("id") != expect_id:
            prog = None
        if prog and prog.get("updated") != last_update:
            last_update = prog.get("updated")
            done = prog.get("done", 0)
            total = prog.get("total")
            rate_key = f"{prog.get('phase', 'frames')}_per_sec"
            rate = prog.get(rate_key)
            line = f"{prog.get('phase', 'frames')} {done}"
            if total is not None:
                line += f"/{total}"
            if rate is not None:
                line += f"  ({rate}/s)"
            print(line, flush=True)
        state = (status or {}).get("state")
        if state in ("complete", "failed", "cancelled"):
            print(json.dumps(status, indent=2))
            return 0 if state == "complete" else 1
        time.sleep(poll)


def _proc_alive(pid: int) -> bool:
    """Zombie-aware process liveness (shared by drain and doctor).

    NOT bare os.kill(pid, 0): that succeeds on a ZOMBIE — an exited serve
    whose parent has not reaped it yet — and raises PermissionError for a
    LIVE process owned by someone else. /proc state Z means
    exited-for-our-purposes; kill(0) is only the no-/proc fallback.
    """
    import os

    try:
        with open(f"/proc/{pid}/stat") as f:
            state = f.read().rsplit(")", 1)[1].split()[0]
        return state != "Z"
    except (OSError, IndexError):
        pass  # no /proc (or racing exit): fall back to kill(0)
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else


_DOCTOR_PROBE = """\
import json, sys, time
mode = sys.argv[1]
import jax
if mode == "cpu":
    # the env may force-register an accelerator plugin via sitecustomize
    # (overriding JAX_PLATFORMS); pinning must happen via jax.config
    jax.config.update("jax_platforms", "cpu")
t0 = time.time()
devs = jax.devices()
init_s = time.time() - t0
import jax.numpy as jnp
t0 = time.time()
out = jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256), jnp.float32))
out.block_until_ready()
compile_s = time.time() - t0
print(json.dumps({
    "backend": jax.default_backend(), "n_devices": len(devs),
    "kind": devs[0].device_kind, "init_s": round(init_s, 2),
    "compile_s": round(compile_s, 2),
}))
"""


def _cmd_doctor(args) -> int:
    """Environment/health report with BOUNDED backend probes.

    ``info`` initializes jax in-process: against a dead accelerator relay
    that call simply hangs (observed: backend init blocked 28+ minutes).
    Each doctor probe therefore runs in a subprocess under a timeout, so
    the report always completes and a dead relay is a diagnosis, not a
    hang. Exit code 0 = all checks passed, 1 = at least one [FAIL].
    """
    import importlib.util
    import os
    import subprocess
    import tempfile
    import time

    failed = []

    def emit(ok, name, detail, warn=False):
        tag = "ok  " if ok else ("warn" if warn else "FAIL")
        if not ok and not warn:
            failed.append(name)
        print(f"[{tag}] {name}: {detail}")

    try:
        from importlib.metadata import version as _v

        ver = _v("sequitr-tpu")
    except Exception:
        ver = "(source tree)"
    import platform

    import numpy as np

    print(f"sequitr-tpu {ver} | python {platform.python_version()} | "
          f"numpy {np.__version__}")

    def probe(mode):
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, "-c", _DOCTOR_PROBE, mode],
                capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            return None, f"probe timed out after {args.timeout:.0f}s"
        if res.returncode != 0:
            tail = (res.stderr or "").strip().splitlines()
            return None, f"probe crashed: {tail[-1] if tail else '?'}"
        try:
            info = json.loads(res.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            return None, "probe produced no report"
        info["wall_s"] = round(time.time() - t0, 1)
        return info, None

    info, err = probe("default")
    if info is None:
        emit(False, "accelerator backend",
             f"UNREACHABLE ({err}) - relay/driver down? Serving jobs "
             "would hang at jax init. SEQUITR_FORCE_CPU=1 still serves "
             "on CPU if the cpu check below passes")
    else:
        emit(True, "accelerator backend",
             f"{info['backend']} x{info['n_devices']} ({info['kind']}), "
             f"init {info['init_s']}s, tiny-jit compile {info['compile_s']}s")
    info, err = probe("cpu")
    if info is None:
        emit(False, "cpu fallback", f"UNREACHABLE ({err})")
    else:
        emit(True, "cpu fallback",
             f"{info['n_devices']} device(s), compile {info['compile_s']}s")

    from sequitr_tpu import native

    native_ok = native.available()
    emit(native_ok, "native helpers",
         "C++ library built (ccl, label stats, crc32c, LZW)" if native_ok
         else "unavailable - scipy/python fallbacks active (slower "
              "localization + compressed ingest)", warn=True)

    for mod, why in [
        ("PIL", "exotic-TIFF ingest fallback"),
        ("h5py", "objects.h5 localization export"),
        ("tensorflow", "TFRecord interchange tests / keras parity"),
        ("torch", "torch parity reference"),
    ]:
        present = importlib.util.find_spec(mod) is not None
        emit(present, f"optional: {mod}",
             f"present ({why})" if present else f"absent - {why} disabled",
             warn=True)

    if args.jobs_dir:
        jd = args.jobs_dir
        if not os.path.isdir(jd):
            emit(False, "jobs dir", f"{jd} does not exist")
        else:
            try:
                with tempfile.NamedTemporaryFile(dir=jd, prefix=".doctor-"):
                    pass
                emit(True, "jobs dir", f"{jd} writable")
            except OSError as e:
                emit(False, "jobs dir", f"{jd} not writable: {e}")
            names = os.listdir(jd)
            queued = sum(
                n.startswith("job_") and n.endswith(".json") for n in names
            )
            running = sum(n.endswith(".running") for n in names)
            rejected = sum(n.endswith(".rejected") for n in names)
            emit(True, "queue",
                 f"{queued} queued, {running} running, {rejected} rejected")
            pidfile = os.path.join(jd, ".serve.pid")
            if os.path.exists(pidfile):
                try:
                    pid = int(open(pidfile).read().strip())
                except (ValueError, OSError):
                    pid = None
                if pid is not None and _proc_alive(pid):
                    emit(True, "serve process", f"pid {pid} alive")
                else:
                    emit(False, "serve process",
                         f"stale pidfile {pidfile} (no such process)",
                         warn=True)
            else:
                emit(False, "serve process", "none (no pidfile)", warn=True)

    n_models = 0
    if os.path.isdir(args.models_dir):
        n_models = sum(
            os.path.exists(os.path.join(args.models_dir, d, "config.json"))
            for d in os.listdir(args.models_dir)
        )
    emit(True, "models", f"{n_models} registered in {args.models_dir}")

    if failed:
        print(f"\n{len(failed)} check(s) failed: {', '.join(failed)}")
        return 1
    print("\nall checks passed")
    return 0


def main(argv=None) -> int:
    import os

    # install the drain-flag handler BEFORE anything slow (jax init on a
    # worker takes tens of seconds): a SIGUSR1 arriving while the process
    # is still booting must set the flag, not hit the default action
    # (terminate) — ImageServer.run_forever later re-installs its own
    # handler and consumes this early flag. Harmless for the quick CLI
    # commands.
    early_drain = {"drain": False}
    try:
        import signal as _signal

        _signal.signal(
            _signal.SIGUSR1, lambda s, f: early_drain.update(drain=True)
        )
    except (ValueError, OSError, AttributeError):
        pass  # non-main thread or platform without SIGUSR1

    if os.environ.get("SEQUITR_FORCE_CPU"):
        # pin the CPU backend for ops/test tooling. Must happen via
        # jax.config BEFORE any backend initialization: site customizations
        # that pre-register accelerator plugins override the JAX_PLATFORMS
        # env var, but not a config update made before first use.
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(prog="sequitr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ap_serve = sub.add_parser("serve", help="run the image server")
    ap_serve.add_argument("--config", help="ServerConfiguration JSON path")
    ap_serve.add_argument("--jobs-dir", default="./jobs")
    ap_serve.add_argument("--models-dir", default="./models")
    ap_serve.add_argument("--poll-interval", type=float, default=1.0)
    ap_serve.add_argument(
        "--workers", type=int, default=1,
        help="worker processes sharing the queue (claims are atomic, so one"
             " claimer per accelerator scales serving across chips)",
    )
    ap_serve.add_argument(
        "--pin-env", default=None, metavar="VAR",
        help="env var set to the worker index in each worker, e.g."
             " TPU_VISIBLE_DEVICES to pin one chip per worker",
    )

    ap_submit = sub.add_parser(
        "submit",
        help="submit a job JSON — or a WORKFLOW (a JSON list of specs, "
             "each auto-chained on the previous step's output dir)",
    )
    ap_submit.add_argument("--jobs-dir", default="./jobs")
    ap_submit.add_argument(
        "spec",
        help="job spec JSON file (or '-' for stdin); a JSON LIST is a "
             "workflow: step k gets depends_on = step k-1's output unless "
             "it sets its own (use [] to opt out)",
    )
    ap_submit.add_argument(
        "--follow", action="store_true",
        help="after submitting, live-tail the job (status --follow on the"
             " spec's output dir); exit 0 = complete",
    )
    ap_submit.add_argument(
        "--after", action="append", metavar="OUTPUT_DIR",
        help="chain: run only after this output dir holds a complete"
             " status.json (repeatable; adds to the spec's depends_on —"
             " a failed/cancelled dependency fails this job)",
    )

    ap_status = sub.add_parser("status", help="read a job output status")
    ap_status.add_argument("output_dir")
    ap_status.add_argument(
        "--follow", action="store_true",
        help="live-tail the job: print each progress update until the job"
             " reaches a terminal state (exit 0 = complete, 1 otherwise)",
    )
    ap_status.add_argument(
        "--poll", type=float, default=1.0,
        help="seconds between --follow polls (default 1)",
    )

    ap_models = sub.add_parser("models", help="list registered models")
    ap_models.add_argument("--models-dir", default="./models")

    ap_queue = sub.add_parser("queue", help="show the job queue state")
    ap_queue.add_argument("--jobs-dir", default="./jobs")

    ap_cancel = sub.add_parser(
        "cancel",
        help="cancel a job: removes it from the queue, or — if already "
        "claimed — asks the running worker to stop at its next frame/step",
    )
    ap_cancel.add_argument("--jobs-dir", default="./jobs")
    ap_cancel.add_argument("job_id")

    ap_info = sub.add_parser(
        "info", help="print version, backend/devices, native status,"
                     " registered pipelines"
    )
    ap_info.add_argument("--models-dir", default="./models")

    ap_doctor = sub.add_parser(
        "doctor",
        help="environment/health report: backend reachability (bounded"
             " probes that cannot hang on a dead relay), compile latency,"
             " native helpers, optional deps, queue health",
    )
    ap_doctor.add_argument("--jobs-dir", default=None)
    ap_doctor.add_argument("--models-dir", default="./models")
    ap_doctor.add_argument(
        "--timeout", type=float, default=120.0,
        help="seconds to allow each backend probe (first TPU compile through"
             " a relay can take minutes; default 120)",
    )

    ap_stats = sub.add_parser(
        "stats", help="summarize a server's jobs.jsonl ledger (enable with"
                      " log_dir in the server config)"
    )
    ap_stats.add_argument("ledger", help="path to jobs.jsonl or its log dir")

    ap_drain = sub.add_parser(
        "drain",
        help="gracefully drain the serve process watching a jobs dir: it"
             " finishes running jobs, claims nothing further, and exits"
             " with the queue untouched (rolling restarts)",
    )
    ap_drain.add_argument("--jobs-dir", default="./jobs")
    ap_drain.add_argument(
        "--wait", action="store_true",
        help="block until the serve process has exited",
    )
    ap_drain.add_argument(
        "--timeout", type=float, default=None,
        help="give up after this many seconds (exit 1); implies --wait",
    )

    ap_retry = sub.add_parser(
        "retry", help="re-queue a FAILED job (moves its .failed marker back"
                      " into the queue)"
    )
    ap_retry.add_argument("--jobs-dir", default="./jobs")
    ap_retry.add_argument("job_id")

    ap_imp = sub.add_parser(
        "import-model",
        help="register external weights (flat npz) as a served model — the"
             " reference-migration entry point (see docs/MIGRATION.md)",
    )
    ap_imp.add_argument("--models-dir", default="./models")
    ap_imp.add_argument("--npz", required=True, help="flat npz of weights")
    ap_imp.add_argument(
        "--arch", required=True,
        help="architecture JSON (same fields as the train jobs: preset or"
             " num_classes/depth/base_features/... ; for --kind gan:"
             " gen_depth/gen_base_features/disc_layers/...)",
    )
    ap_imp.add_argument("--kind", choices=["unet", "gan"], default="unet")
    ap_imp.add_argument(
        "--layout", choices=["jax", "tf", "torch"], default="jax",
        help="source kernel layout; tf/torch kernels are transposed to the"
             " canonical HWIO / (k..,in,out) forms (models.convert maps)",
    )
    ap_imp.add_argument("name", help="model name to register")

    ap_exp = sub.add_parser(
        "export-model", help="dump a registered model's weights as flat npz"
    )
    ap_exp.add_argument("--models-dir", default="./models")
    ap_exp.add_argument("name")
    ap_exp.add_argument("out", help="output .npz path")

    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

    if args.cmd == "serve":
        from sequitr_tpu.config import ServerConfiguration
        from sequitr_tpu.server import ImageServer

        if args.config:
            cfg = ServerConfiguration.from_json(args.config)
        else:
            cfg = ServerConfiguration(
                jobs_dir=args.jobs_dir,
                models_dir=args.models_dir,
                poll_interval=args.poll_interval,
            )
        # pidfile: lets `sequitr_tpu drain` find this serve process without
        # the operator hunting pids. One serve entry (supervisor OR single
        # worker) per jobs dir is the deployment model; a stale file from a
        # crashed serve is overwritten here and tolerated by `drain`.
        # Written into the EFFECTIVE jobs dir (a --config file may point
        # somewhere other than the --jobs-dir flag's default).
        pidfile = os.path.join(cfg.jobs_dir, ".serve.pid")
        if os.environ.get("SEQUITR_WORKER_ID") is not None:
            pidfile = None  # a supervised worker: the supervisor owns it
        else:
            try:
                os.makedirs(cfg.jobs_dir, exist_ok=True)
                with open(pidfile, "w") as f:
                    f.write(str(os.getpid()))
            except OSError:
                pidfile = None
        try:
            if args.workers > 1:
                return _serve_workers(args)
            ImageServer(cfg).run_forever(early_drain=early_drain)
            return 0
        finally:
            if pidfile:
                try:
                    # only remove our own pidfile (a replacement serve may
                    # have already overwritten it)
                    with open(pidfile) as f:
                        if f.read().strip() == str(os.getpid()):
                            os.unlink(pidfile)
                except (OSError, ValueError):
                    pass

    if args.cmd == "submit":
        from sequitr_tpu.server import submit_job

        spec = json.load(sys.stdin if args.spec == "-" else open(args.spec))
        # a LIST is a WORKFLOW file: each spec auto-chains on the
        # previous job's output dir (override with an explicit
        # depends_on, including [] for "independent")
        specs = spec if isinstance(spec, list) else [spec]
        if not specs or not all(isinstance(s, dict) for s in specs):
            print(
                "spec must be a JSON object or a non-empty list of them",
                file=sys.stderr,
            )
            return 1
        for i, s in enumerate(specs):
            if i > 0 and "depends_on" not in s:
                prev_out = specs[i - 1].get("output")
                if not prev_out:
                    print(
                        f"workflow step {i - 1} needs an 'output' dir for "
                        f"step {i} to chain on (or give step {i} an "
                        f"explicit depends_on)",
                        file=sys.stderr,
                    )
                    return 1
                s["depends_on"] = str(prev_out)
        if args.after:
            first = specs[0]
            deps = first.get("depends_on") or []
            if isinstance(deps, str):
                deps = [deps]
            first["depends_on"] = list(deps) + list(args.after)
        if args.follow and not specs[-1].get("output"):
            print(
                "--follow needs an 'output' dir in the (last) spec to tail",
                file=sys.stderr,
            )
            return 1
        job_id = None
        for s in specs:
            job_id = submit_job(args.jobs_dir, s)
            print(job_id)
        if args.follow:
            # follows the LAST job of a workflow (its completion implies
            # the chain's). expect_id: a previous run's terminal
            # status.json in the same output dir (the resume flow) must
            # not be mistaken for THIS job's result
            return _follow_job(
                str(specs[-1]["output"]), 1.0, expect_id=job_id
            )
        return 0

    if args.cmd == "status":
        import os
        import time

        path = os.path.join(args.output_dir, "status.json")
        ppath = os.path.join(args.output_dir, "progress.json")
        if not args.follow:
            print(open(path).read())
            # a running job's live progress (progress.json updates every
            # ~2 s while frames/steps flow; status.json only at the end)
            try:
                status = json.load(open(path))
                if status.get("state") == "running" and os.path.exists(ppath):
                    print(open(ppath).read())
            except (OSError, ValueError):
                pass
            return 0
        return _follow_job(args.output_dir, args.poll)

    if args.cmd == "models":
        import os

        rows = []
        for name in sorted(os.listdir(args.models_dir)) if os.path.isdir(args.models_dir) else []:
            cfg_path = os.path.join(args.models_dir, name, "config.json")
            if not os.path.exists(cfg_path):
                continue
            cfg = json.load(open(cfg_path))
            kind = cfg.get("__kind__", "?")
            desc = {
                k: cfg[k]
                for k in ("num_classes", "depth", "base_features", "dims",
                          "space_to_depth", "in_channels", "gen_depth")
                if k in cfg and cfg[k] not in (None,)
            }
            rows.append((name, kind, desc))
        if not rows:
            print("(no models registered)")
        for name, kind, desc in rows:
            print(f"{name:24s} {kind:5s} " + " ".join(f"{k}={v}" for k, v in desc.items()))
        return 0

    if args.cmd == "queue":
        import os

        from sequitr_tpu.server import scan_jobs

        pending = scan_jobs(args.jobs_dir)
        names = sorted(os.listdir(args.jobs_dir)) if os.path.isdir(args.jobs_dir) else []
        # .running.reclaim = a dead owner's claim mid-rescue: still "running"
        # from the operator's view (it requeues on the next worker tick)
        running = [
            n for n in names
            if n.endswith(".running") or n.endswith(".running.reclaim")
        ]
        failed = [n for n in names if n.endswith(".failed")]
        rejected = [n for n in names if n.endswith(".rejected")]
        from sequitr_tpu.server import jobs as jobs_lib

        print(f"pending:  {len(pending)}")
        for p in pending:
            state, detail = jobs_lib.check_dependencies(p)
            note = ""
            if state == "wait":
                note = f"  [waiting on {detail}]"
            elif state == "fail":
                note = f"  [will fail: {detail}]"
            print(f"  {os.path.basename(p)}{note}")
        print(f"running:  {len(running)}")
        for n in running:
            print(f"  {n}")
        print(f"failed:   {len(failed)}")
        for n in failed:
            print(f"  {n}")
        print(f"rejected: {len(rejected)}")
        for n in rejected:
            print(f"  {n}")
        return 0

    if args.cmd == "info":
        import os

        import jax

        from sequitr_tpu import native
        from sequitr_tpu.server.server import REGISTRY

        try:
            from importlib.metadata import version as _v

            ver = _v("sequitr-tpu")
        except Exception:
            ver = "(source tree)"
        print(f"sequitr-tpu {ver}")
        print(f"jax {jax.__version__} backend={jax.default_backend()} "
              f"devices={len(jax.devices())}")
        print(f"native helpers: {'available' if native.available() else 'scipy fallback'}")
        print(f"pipelines: {', '.join(REGISTRY.names())}")
        n_models = 0
        if os.path.isdir(args.models_dir):
            n_models = sum(
                os.path.exists(os.path.join(args.models_dir, d, "config.json"))
                for d in os.listdir(args.models_dir)
            )
        print(f"models in {args.models_dir}: {n_models}")
        return 0

    if args.cmd == "doctor":
        return _cmd_doctor(args)

    if args.cmd == "stats":
        import os
        from collections import Counter, defaultdict

        path = args.ledger
        if os.path.isdir(path):
            path = os.path.join(path, "jobs.jsonl")
        try:
            lines = open(path).read().splitlines()
        except OSError as e:
            print(f"cannot read ledger: {e}", file=sys.stderr)
            return 1
        rows = []
        for line in lines:
            try:
                rows.append(json.loads(line))
            except ValueError:
                continue  # torn tail line from a live server
        if not rows:
            print("(empty ledger)")
            return 0
        by_state = Counter(r.get("state", "?") for r in rows)
        by_module = defaultdict(lambda: {"n": 0, "s": 0.0, "failed": 0})
        retried = sum(1 for r in rows if (r.get("attempts") or 1) > 1)
        workers = Counter(
            str(r.get("worker")) for r in rows if r.get("worker") is not None
        )
        for r in rows:
            m = by_module[r.get("module", "?")]
            m["n"] += 1
            m["s"] += float(r.get("elapsed_s") or 0.0)
            m["failed"] += r.get("state") == "failed"
        span = max(r.get("finished", 0.0) for r in rows) - min(
            r.get("finished", 0.0) for r in rows
        )
        print(f"jobs: {len(rows)} "
              + " ".join(f"{k}={v}" for k, v in sorted(by_state.items())))
        if span > 0:
            print(f"span: {span/3600:.2f} h ({len(rows)/span*3600:.1f} jobs/h)")
        if retried:
            print(f"retried: {retried}")
        if workers:
            print("workers: "
                  + " ".join(f"{k}:{v}" for k, v in sorted(workers.items())))
        print(f"{'module':28s} {'n':>5s} {'failed':>6s} {'mean s':>8s} {'total h':>8s}")
        for name, m in sorted(by_module.items(), key=lambda kv: -kv[1]["s"]):
            print(
                f"{name:28s} {m['n']:5d} {m['failed']:6d} "
                f"{m['s']/m['n']:8.2f} {m['s']/3600:8.2f}"
            )
        return 0

    if args.cmd == "drain":
        import os
        import signal as signal_lib
        import time

        pidfile = os.path.join(args.jobs_dir, ".serve.pid")
        try:
            pid = int(open(pidfile).read().strip())
        except (OSError, ValueError):
            print(
                f"no serve process found for {args.jobs_dir} (no readable "
                f"{pidfile})", file=sys.stderr,
            )
            return 1

        def alive():
            # zombie-aware, shared with doctor (observed: --wait spun for
            # its full timeout on an already-drained server under kill(0))
            return _proc_alive(pid)

        def is_ours():
            # never signal a bystander: a SIGKILLed serve leaves its
            # pidfile behind and the pid can be recycled by an unrelated
            # process — whose default SIGUSR1 disposition is TERMINATE
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    return b"sequitr_tpu" in f.read()
            except OSError:
                return True  # no /proc: fall back to trusting the pidfile

        def remove_stale():
            # re-check content before unlinking: a replacement serve may
            # have overwritten the pidfile since we read it
            try:
                with open(pidfile) as f:
                    if f.read().strip() == str(pid):
                        os.unlink(pidfile)
            except OSError:
                pass

        if not alive():
            remove_stale()
            print(
                f"serve process {pid} is not running (stale pidfile "
                "removed)", file=sys.stderr,
            )
            return 1
        if not is_ours():
            remove_stale()
            print(
                f"pid {pid} is not a sequitr_tpu serve process (recycled "
                "pid; stale pidfile removed)", file=sys.stderr,
            )
            return 1
        try:
            os.kill(pid, signal_lib.SIGUSR1)
        except OSError as e:
            print(f"cannot signal serve process {pid}: {e}", file=sys.stderr)
            return 1
        print(
            f"drain requested (pid {pid}): running jobs finish, the queue "
            "is left untouched"
        )
        if not args.wait and args.timeout is None:
            return 0
        # --timeout implies --wait (a bounded wait is still a wait)
        deadline = (
            time.monotonic() + args.timeout
            if args.timeout is not None else None
        )
        while alive():
            if deadline is not None and time.monotonic() > deadline:
                print(
                    f"serve process {pid} still draining after "
                    f"{args.timeout:.0f}s", file=sys.stderr,
                )
                return 1
            time.sleep(0.5)
        print("drained")
        return 0

    if args.cmd == "retry":
        import os

        from sequitr_tpu.server import jobs as jobs_lib

        failed = os.path.join(
            args.jobs_dir,
            f"{jobs_lib.JOB_PREFIX}{args.job_id}"
            f"{jobs_lib.CLAIMED_SUFFIX}.failed",
        )
        queued = os.path.join(
            args.jobs_dir,
            f"{jobs_lib.JOB_PREFIX}{args.job_id}{jobs_lib.JOB_SUFFIX}",
        )
        try:
            os.rename(failed, queued)
            print(f"re-queued {args.job_id}")
            return 0
        except FileNotFoundError:
            print(
                f"{args.job_id}: no failed marker in {args.jobs_dir}",
                file=sys.stderr,
            )
            return 1

    if args.cmd == "import-model":
        import jax
        import numpy as np

        from sequitr_tpu.models import convert as convert_lib
        from sequitr_tpu.server.server import (
            save_model, unet_config_from_params,
        )

        with open(args.arch) as f:
            arch = json.load(f)
        if args.kind == "unet":
            from sequitr_tpu.models import unet as unet_lib

            cfg = unet_config_from_params(arch)
            t_params, t_state = unet_lib.init(jax.random.PRNGKey(0), cfg)
        else:
            import jax.numpy as jnp

            from sequitr_tpu.models import gan as gan_lib

            cfg = gan_lib.GANConfig(
                in_channels=int(arch.get("in_channels", 1)),
                out_channels=int(arch.get("out_channels", 1)),
                gen_depth=int(arch.get("gen_depth", 4)),
                gen_base_features=int(arch.get("gen_base_features", 32)),
                disc_layers=int(arch.get("disc_layers", 3)),
                disc_base_features=int(arch.get("disc_base_features", 64)),
                compute_dtype=jnp.dtype(arch.get("compute_dtype", "bfloat16")),
            )
            t_params, t_state = gan_lib.init(jax.random.PRNGKey(0), cfg)

        raw_names = list(np.load(args.npz).files)
        has_state = any(n.startswith("state/") for n in raw_names)
        kernel_map = None
        if args.layout == "tf":
            # transposed-conv kernels differ between TF and the canonical
            # layout; regular convs are HWIO in both
            kernel_map = lambda path, w: (
                convert_lib.tf_transpose_kernel_to_jax(w)
                if "/up/" in f"/{path}/" and path.endswith("/w") and w.ndim >= 4
                else w
            )
        elif args.layout == "torch":
            kernel_map = lambda path, w: (
                convert_lib.torch_transpose_kernel_to_jax(w)
                if "/up/" in f"/{path}/" and path.endswith("/w") and w.ndim >= 4
                else (
                    convert_lib.torch_kernel_to_jax(w)
                    if path.endswith("/w") and w.ndim >= 4 else w
                )
            )
        params = convert_lib.load_npz_weights(
            args.npz, t_params,
            name_map=lambda n: None if n.startswith("state/") else n,
            kernel_map=kernel_map,
        )
        if has_state:
            # batch-norm running statistics round-trip under a state/ prefix
            state = convert_lib.load_npz_weights(
                args.npz, t_state,
                name_map=lambda n: (
                    n[len("state/"):] if n.startswith("state/") else None
                ),
            )
        else:
            state = t_state
            norm_batch = (
                cfg.norm == "batch" if args.kind == "unet"
                else cfg.gen_norm == "batch"
            )
            if norm_batch:
                print(
                    "warning: npz carries no state/ entries — batch-norm "
                    "running statistics default to mean=0/var=1, which will "
                    "NOT match a trained checkpoint. Export with this CLI "
                    "(which includes them) or add state/... keys.",
                    file=sys.stderr,
                )
        model_dir = save_model(
            args.models_dir, args.name, args.kind, cfg, params, state
        )
        print(model_dir)
        return 0

    if args.cmd == "export-model":
        import numpy as np

        from sequitr_tpu.models import convert as convert_lib
        from sequitr_tpu.server.server import load_model

        kind, cfg, params, state = load_model(args.models_dir, args.name)
        flat = convert_lib.flatten_params(params)
        state_flat = {
            f"state/{k}": v
            for k, v in convert_lib.flatten_params(state).items()
        }
        np.savez(args.out, **flat, **state_flat)
        print(
            f"{args.out}: {len(flat)} weight + {len(state_flat)} state "
            f"arrays ({kind})"
        )
        return 0

    if args.cmd == "cancel":
        from sequitr_tpu import client as client_lib

        got = client_lib.cancel_job(args.jobs_dir, args.job_id)
        if got == "cancelled":
            print(f"cancelled {args.job_id}")
            return 0
        if got == "requested":
            # already claimed: the worker polls the marker between
            # frames/steps; training checkpoints before stopping
            print(
                f"{args.job_id}: running — cancel requested; the worker "
                "will stop at its next frame/step"
            )
            return 0
        print(
            f"{args.job_id}: not in the queue or running (done, failed, "
            "or never submitted)", file=sys.stderr,
        )
        return 1

    return 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        # downstream pipe (e.g. `status | grep -m1`) closed early — exit
        # quietly like standard unix tools instead of tracebacking
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
