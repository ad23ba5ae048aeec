"""CLI tests: python -m sequitr_tpu submit/status (in-process)."""

import json
import os

import numpy as np

from sequitr_tpu.__main__ import main
from sequitr_tpu.server import scan_jobs


class TestCLI:
    def test_submit_and_status(self, tmp_path, capsys):
        jobs_dir = str(tmp_path / "jobs")
        os.makedirs(jobs_dir)
        spec_path = str(tmp_path / "spec.json")
        out_dir = str(tmp_path / "out")
        with open(spec_path, "w") as f:
            json.dump({"module": "m", "input": [], "output": out_dir}, f)

        rc = main(["submit", "--jobs-dir", jobs_dir, spec_path])
        assert rc == 0
        job_id = capsys.readouterr().out.strip()
        assert job_id
        assert len(scan_jobs(jobs_dir)) == 1

        os.makedirs(out_dir)
        with open(os.path.join(out_dir, "status.json"), "w") as f:
            json.dump({"state": "complete"}, f)
        rc = main(["status", out_dir])
        assert rc == 0
        assert "complete" in capsys.readouterr().out

    def test_submit_workflow_file_auto_chains(self, tmp_path, capsys):
        """A LIST spec is a workflow: each step auto-chains on the
        previous step's output dir unless it sets depends_on itself."""
        from sequitr_tpu.server import jobs as jobs_lib

        jobs_dir = str(tmp_path / "jobs")
        os.makedirs(jobs_dir)
        spec_path = str(tmp_path / "wf.json")
        with open(spec_path, "w") as f:
            json.dump(
                [
                    {"module": "a", "input": [], "output": str(tmp_path / "oa")},
                    {"module": "b", "input": [], "output": str(tmp_path / "ob")},
                    # explicit [] opts OUT of chaining
                    {"module": "c", "input": [], "depends_on": [],
                     "output": str(tmp_path / "oc")},
                ],
                f,
            )
        rc = main(["submit", "--jobs-dir", jobs_dir, spec_path])
        assert rc == 0
        ids = capsys.readouterr().out.split()
        assert len(ids) == 3
        paths = {p.split("job_")[-1][:-5]: p for p in scan_jobs(jobs_dir)}
        jb = jobs_lib.Job.from_file(paths[ids[1]])
        assert jb.depends_on == [str(tmp_path / "oa")]
        jc = jobs_lib.Job.from_file(paths[ids[2]])
        assert jc.depends_on == []

    def test_submit_workflow_needs_output_to_chain(self, tmp_path, capsys):
        jobs_dir = str(tmp_path / "jobs")
        os.makedirs(jobs_dir)
        spec_path = str(tmp_path / "wf.json")
        with open(spec_path, "w") as f:
            json.dump(
                [{"module": "a", "input": []}, {"module": "b", "input": []}],
                f,
            )
        rc = main(["submit", "--jobs-dir", jobs_dir, spec_path])
        assert rc == 1
        assert len(scan_jobs(jobs_dir)) == 0  # nothing half-submitted

    def test_submit_after_flag_and_queue_annotation(self, tmp_path, capsys):
        """--after injects a dependency; the queue CLI annotates what a
        waiting job is blocked on."""
        jobs_dir = str(tmp_path / "jobs")
        os.makedirs(jobs_dir)
        dep_dir = str(tmp_path / "dep")
        spec_path = str(tmp_path / "spec.json")
        with open(spec_path, "w") as f:
            json.dump(
                {"module": "m", "input": [], "output": str(tmp_path / "o")},
                f,
            )
        rc = main(
            ["submit", "--jobs-dir", jobs_dir, "--after", dep_dir, spec_path]
        )
        assert rc == 0
        capsys.readouterr()
        assert main(["queue", "--jobs-dir", jobs_dir]) == 0
        out = capsys.readouterr().out
        assert f"[waiting on {dep_dir}]" in out
        # dependency completes -> annotation disappears
        os.makedirs(dep_dir)
        with open(os.path.join(dep_dir, "status.json"), "w") as f:
            json.dump({"state": "complete"}, f)
        main(["queue", "--jobs-dir", jobs_dir])
        assert "waiting on" not in capsys.readouterr().out

    def test_submit_from_stdin(self, tmp_path, monkeypatch, capsys):
        import io

        jobs_dir = str(tmp_path / "jobs")
        os.makedirs(jobs_dir)
        monkeypatch.setattr(
            "sys.stdin", io.StringIO(json.dumps({"module": "m", "output": "o"}))
        )
        rc = main(["submit", "--jobs-dir", jobs_dir, "-"])
        assert rc == 0
        assert len(scan_jobs(jobs_dir)) == 1


class TestMultiWorkerServe:
    def test_two_workers_share_the_queue(self, tmp_path):
        """`serve --workers 2`: concurrent claimers drain one jobs dir —
        every job completes exactly once (atomic rename claims)."""
        import subprocess
        import sys
        import time

        import numpy as np

        from sequitr_tpu.data import tiff
        from sequitr_tpu.server import submit_job

        jobs = str(tmp_path / "jobs")
        models = str(tmp_path / "models")
        os.makedirs(jobs)
        rng = np.random.default_rng(0)
        img_p, lab_p = str(tmp_path / "i.tif"), str(tmp_path / "l.tif")
        images = rng.random((2, 8, 8)).astype(np.float32)
        tiff.write_stack(img_p, images)
        tiff.write_stack(lab_p, (images > 0.5).astype(np.uint16))

        outs = []
        for i in range(4):
            out = str(tmp_path / f"out{i}")
            outs.append(out)
            submit_job(
                jobs,
                {"module": "build_records",
                 "params": {"num_classes": 2, "weight_maps": False},
                 "input": [img_p, lab_p], "output": out},
                job_id=f"j{i}",
            )

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve",
             "--jobs-dir", jobs, "--models-dir", models,
             "--poll-interval", "0.2", "--workers", "2"],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        try:
            deadline = time.time() + 120
            done = set()
            while time.time() < deadline and len(done) < 4:
                for out in outs:
                    p = os.path.join(out, "status.json")
                    if out not in done and os.path.exists(p):
                        try:
                            st = json.load(open(p))
                        except json.JSONDecodeError:
                            continue  # mid-write
                        if st.get("state") in ("complete", "failed"):
                            assert st["state"] == "complete", st.get("error")
                            done.add(out)
                time.sleep(0.5)
            assert len(done) == 4, f"only {len(done)}/4 jobs completed"
            # queue fully drained, nothing left behind
            assert scan_jobs(jobs) == []
        finally:
            proc.terminate()
            proc.wait(timeout=30)


class TestModelsQueueCommands:
    def test_models_lists_registered(self, tmp_path, capsys):
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.models import unet
        from sequitr_tpu.server.server import save_model

        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        md = str(tmp_path / "models")
        save_model(md, "demo", "unet", cfg, params, state)
        assert main(["models", "--models-dir", md]) == 0
        out = capsys.readouterr().out
        assert "demo" in out and "unet" in out and "num_classes=2" in out

    def test_models_empty(self, tmp_path, capsys):
        assert main(["models", "--models-dir", str(tmp_path / "none")]) == 0
        assert "no models" in capsys.readouterr().out

    def test_queue_states(self, tmp_path, capsys):
        from sequitr_tpu.server import submit_job

        jobs = str(tmp_path / "jobs")
        os.makedirs(jobs)
        submit_job(jobs, {"module": "m", "input": [], "output": ""}, job_id="p1")
        open(os.path.join(jobs, "job_r1.running"), "w").write("{}")
        open(os.path.join(jobs, "job_f1.running.failed"), "w").write("{}")
        open(os.path.join(jobs, "job_x.json.rejected"), "w").write("junk")
        assert main(["queue", "--jobs-dir", jobs]) == 0
        out = capsys.readouterr().out
        assert "pending:  1" in out and "job_p1.json" in out
        assert "running:  1" in out and "failed:   1" in out
        assert "rejected: 1" in out


class TestStatusFollow:
    def test_follow_prints_updates_until_terminal(self, tmp_path, capsys):
        import json as _json
        import threading
        import time as _time

        out = tmp_path / "out"
        out.mkdir()
        (out / "status.json").write_text(_json.dumps({"state": "running"}))
        # the first update exists BEFORE the follower starts (no race: its
        # very first poll must see it); the driver then waits long enough
        # for several 0.05 s polls before each further transition
        (out / "progress.json").write_text(_json.dumps(
            {"phase": "frames", "done": 3, "total": 10,
             "frames_per_sec": 2.5, "updated": _time.time()}
        ))

        def driver():
            _time.sleep(1.0)
            (out / "progress.json").write_text(_json.dumps(
                {"phase": "frames", "done": 7, "total": 10,
                 "frames_per_sec": 2.5, "updated": _time.time()}
            ))
            _time.sleep(1.0)
            (out / "status.json").write_text(_json.dumps(
                {"state": "complete", "outputs": {}}
            ))

        t = threading.Thread(target=driver)
        t.start()
        try:
            rc = main(["status", str(out), "--follow", "--poll", "0.05"])
        finally:
            t.join()
        assert rc == 0
        got = capsys.readouterr().out
        assert "frames 3/10" in got and "frames 7/10" in got
        assert '"state": "complete"' in got

    def test_submit_follow_waits_for_ITS_job_not_a_stale_status(
        self, tmp_path, capsys
    ):
        """The resume flow leaves a previous run's terminal status.json in
        the output dir; submit --follow must wait for the NEW job's result
        (matched by id) instead of exiting with the old one."""
        import json as _json
        import threading
        import time as _time

        out = tmp_path / "out"
        out.mkdir()
        # a PREVIOUS run failed into this dir: must be ignored
        (out / "status.json").write_text(_json.dumps(
            {"id": "oldrun", "state": "failed", "error": "boom"}
        ))
        spec = tmp_path / "job.json"
        spec.write_text(_json.dumps(
            {"module": "m", "params": {}, "input": [], "output": str(out)}
        ))
        jobs = tmp_path / "jobs"
        jobs.mkdir()

        def fake_server():
            # claim-free stand-in: find the queued job's id, 'complete' it
            deadline = _time.time() + 30
            jid = None
            while _time.time() < deadline and jid is None:
                for n in os.listdir(jobs):
                    if n.startswith("job_") and n.endswith(".json"):
                        jid = n[len("job_"):-len(".json")]
                _time.sleep(0.05)
            _time.sleep(0.3)  # let the follower see (and ignore) oldrun
            (out / "status.json").write_text(_json.dumps(
                {"id": jid, "state": "complete", "outputs": {}}
            ))

        t = threading.Thread(target=fake_server)
        t.start()
        try:
            rc = main(["submit", "--jobs-dir", str(jobs), str(spec),
                       "--follow"])
        finally:
            t.join()
        assert rc == 0  # the OLD 'failed' status did not decide the exit
        got = capsys.readouterr().out
        assert '"state": "complete"' in got and "oldrun" not in got

    def test_submit_follow_requires_output(self, tmp_path, capsys):
        import json as _json

        spec = tmp_path / "job.json"
        spec.write_text(_json.dumps({"module": "m", "params": {}}))
        assert main(["submit", "--jobs-dir", str(tmp_path / "jobs"),
                     str(spec), "--follow"]) == 1
        assert "needs an 'output'" in capsys.readouterr().err

    def test_follow_failed_job_exits_nonzero(self, tmp_path, capsys):
        import json as _json

        out = tmp_path / "out"
        out.mkdir()
        (out / "status.json").write_text(_json.dumps(
            {"state": "failed", "error": "boom"}
        ))
        assert main(["status", str(out), "--follow", "--poll", "0.05"]) == 1
        assert '"state": "failed"' in capsys.readouterr().out


class TestStatsCommand:
    def test_stats_summarizes_ledger(self, tmp_path, capsys):
        import json as _json
        import time as _time

        logd = tmp_path / "logs"
        logd.mkdir()
        now = _time.time()
        rows = [
            {"id": "a", "module": "segmentation_unet2d", "state": "complete",
             "elapsed_s": 10.0, "attempts": 1, "finished": now - 3600,
             "worker": "0"},
            {"id": "b", "module": "segmentation_unet2d", "state": "failed",
             "elapsed_s": 2.0, "attempts": 2, "finished": now - 1800,
             "worker": "1"},
            {"id": "c", "module": "train_unet2d", "state": "complete",
             "elapsed_s": 100.0, "attempts": 1, "finished": now,
             "worker": "0"},
        ]
        with open(logd / "jobs.jsonl", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
            f.write('{"torn tail')  # live server mid-write: must be skipped
        # accepts the log DIR or the file itself
        assert main(["stats", str(logd)]) == 0
        out = capsys.readouterr().out
        assert "jobs: 3" in out and "complete=2" in out and "failed=1" in out
        assert "retried: 1" in out
        assert "0:2" in out and "1:1" in out  # per-worker counts
        assert "train_unet2d" in out and "segmentation_unet2d" in out
        assert main(["stats", str(logd / "jobs.jsonl")]) == 0

    def test_stats_missing_ledger(self, tmp_path, capsys):
        assert main(["stats", str(tmp_path / "nope")]) == 1
        assert "cannot read ledger" in capsys.readouterr().err

    def test_stats_empty_ledger(self, tmp_path, capsys):
        p = tmp_path / "jobs.jsonl"
        p.write_text("")
        assert main(["stats", str(p)]) == 0
        assert "empty ledger" in capsys.readouterr().out


class TestInfoCommand:
    def test_info_prints_surface(self, tmp_path, capsys):
        assert main(["info", "--models-dir", str(tmp_path / "m")]) == 0
        out = capsys.readouterr().out
        assert "sequitr-tpu" in out and "pipelines:" in out
        assert "segmentation_unet2d" in out and "deconvolve" in out
        assert "backend=" in out


class TestRetryCommand:
    def test_retry_requeues_failed_job(self, tmp_path, capsys):
        """retry moves a .failed marker back into the queue; the server
        then claims it like any fresh submission."""
        from sequitr_tpu.server import claim_job

        jobs = str(tmp_path / "jobs")
        os.makedirs(jobs)
        spec = {"module": "m", "input": [], "output": str(tmp_path / "o")}
        with open(os.path.join(jobs, "job_x1.running.failed"), "w") as f:
            json.dump(dict(spec, id="x1"), f)
        assert main(["retry", "--jobs-dir", jobs, "x1"]) == 0
        paths = scan_jobs(jobs)
        assert len(paths) == 1
        job = claim_job(paths[0])
        assert job is not None and job.module == "m"

    def test_retry_unknown_job_fails(self, tmp_path, capsys):
        jobs = str(tmp_path / "jobs")
        os.makedirs(jobs)
        assert main(["retry", "--jobs-dir", jobs, "nope"]) == 1
        assert "no failed marker" in capsys.readouterr().err


class TestModelInterchange:
    def test_export_then_import_roundtrip(self, tmp_path, capsys):
        """export-model -> import-model reproduces identical weights AND
        batch-norm running statistics (the reference-migration workflow
        through the CLI; a trained BN model must not silently lose its
        moving stats — code-review r3)."""
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.__main__ import main
        from sequitr_tpu.models import unet
        from sequitr_tpu.server.server import load_model, save_model

        models = str(tmp_path / "models")
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="batch", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(3), cfg)
        # non-trivial running stats, as a trained checkpoint would carry
        state = jax.tree.map(
            lambda a: a
            + 0.3 * np.random.default_rng(5).random(a.shape).astype(np.float32),
            state,
        )
        save_model(models, "orig", "unet", cfg, params, state)

        npz = str(tmp_path / "w.npz")
        assert main(["export-model", "--models-dir", models, "orig", npz]) == 0
        arch = str(tmp_path / "arch.json")
        with open(arch, "w") as f:
            json.dump({"in_channels": 1, "num_classes": 2, "depth": 2,
                       "base_features": 4, "norm": "batch",
                       "compute_dtype": "float32"}, f)
        assert main(["import-model", "--models-dir", models, "--npz", npz,
                     "--arch", arch, "imported"]) == 0
        _, _, p2, s2 = load_model(models, "imported")
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(s2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_import_without_state_warns_for_bn(self, tmp_path, capsys):
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.__main__ import main
        from sequitr_tpu.models import convert as convert_lib
        from sequitr_tpu.models import unet

        models = str(tmp_path / "models")
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="batch", compute_dtype=jnp.float32,
        )
        params, _ = unet.init(jax.random.PRNGKey(6), cfg)
        npz = str(tmp_path / "nostate.npz")
        np.savez(npz, **convert_lib.flatten_params(params))
        arch = str(tmp_path / "arch.json")
        with open(arch, "w") as f:
            json.dump({"in_channels": 1, "num_classes": 2, "depth": 2,
                       "base_features": 4, "norm": "batch",
                       "compute_dtype": "float32"}, f)
        assert main(["import-model", "--models-dir", models, "--npz", npz,
                     "--arch", arch, "nostate"]) == 0
        assert "running statistics" in capsys.readouterr().err

    def test_import_tf_layout_transposes_up_kernels(self, tmp_path):
        """--layout tf applies the transposed-conv kernel map on up/*
        kernels only, so a TF-exported checkpoint lands correctly."""
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.__main__ import main
        from sequitr_tpu.models import convert as convert_lib
        from sequitr_tpu.models import unet
        from sequitr_tpu.server.server import load_model

        models = str(tmp_path / "models")
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="none", compute_dtype=jnp.float32,
        )
        params, _ = unet.init(jax.random.PRNGKey(4), cfg)
        flat = convert_lib.flatten_params(params)
        # simulate a TF export: up kernels in TF's transposed layout
        tf_flat = {
            k: (convert_lib.tf_transpose_kernel_to_jax(v)
                if "/up/" in f"/{k}/" and k.endswith("/w") and v.ndim >= 4
                else v)
            for k, v in flat.items()
        }
        npz = str(tmp_path / "tf.npz")
        np.savez(npz, **tf_flat)
        arch = str(tmp_path / "arch.json")
        with open(arch, "w") as f:
            json.dump({"in_channels": 1, "num_classes": 2, "depth": 2,
                       "base_features": 4, "norm": "none",
                       "compute_dtype": "float32"}, f)
        assert main(["import-model", "--models-dir", models, "--npz", npz,
                     "--arch", arch, "--layout", "tf", "fromtf"]) == 0
        _, _, p2, _ = load_model(models, "fromtf")
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestCancelCommand:
    def test_cancel_queued_job(self, tmp_path, capsys):
        from sequitr_tpu.__main__ import main
        from sequitr_tpu.server import scan_jobs, submit_job

        jobs = str(tmp_path / "jobs")
        jid = submit_job(jobs, {"module": "m", "output": str(tmp_path / "o")})
        assert len(scan_jobs(jobs)) == 1
        assert main(["cancel", "--jobs-dir", jobs, jid]) == 0
        assert "cancelled" in capsys.readouterr().out
        # the queue no longer offers it, and no .cancelled litter accumulates
        # in the jobs dir (the rename already won the race vs any claimer)
        assert scan_jobs(jobs) == []
        assert not (tmp_path / "jobs" / f"job_{jid}.json.cancelled").exists()
        assert not (tmp_path / "jobs" / f"job_{jid}.json").exists()

    def test_cancel_unknown_job_fails(self, tmp_path, capsys):
        from sequitr_tpu.__main__ import main

        jobs = str(tmp_path / "jobs")
        os.makedirs(jobs)
        assert main(["cancel", "--jobs-dir", jobs, "deadbeef"]) == 1
        assert "not in the queue" in capsys.readouterr().err


class TestDoctorCommand:
    def test_doctor_reports_and_exit_code(self, tmp_path, capsys):
        """doctor must complete (bounded probes) even when the backend is
        unreachable; a ~0 timeout forces that path deterministically."""
        from sequitr_tpu.__main__ import main
        from sequitr_tpu.server import submit_job

        jobs = str(tmp_path / "jobs")
        submit_job(jobs, {"module": "m", "output": str(tmp_path / "o")})
        rc = main([
            "doctor", "--jobs-dir", jobs,
            "--models-dir", str(tmp_path / "models"),
            "--timeout", "0.05",
        ])
        out = capsys.readouterr().out
        assert rc == 1  # both backend probes timed out -> failure exit
        assert "accelerator backend" in out and "UNREACHABLE" in out
        assert "1 queued, 0 running, 0 rejected" in out
        assert "native helpers" in out
        assert "check(s) failed" in out

    def test_doctor_missing_jobs_dir_fails(self, tmp_path, capsys):
        from sequitr_tpu.__main__ import main

        rc = main([
            "doctor", "--jobs-dir", str(tmp_path / "nope"),
            "--timeout", "0.05",
        ])
        out = capsys.readouterr().out
        assert rc == 1
        assert "does not exist" in out

    def test_doctor_healthy_path_exit_zero(self, tmp_path, capsys, monkeypatch):
        """The success report: both probes pass (fast fake probe script),
        live pidfile, writable queue -> every hard check ok, rc 0."""
        import sequitr_tpu.__main__ as main_mod

        monkeypatch.setattr(
            main_mod, "_DOCTOR_PROBE",
            "import json, sys; print(json.dumps({'backend': 'cpu',"
            " 'n_devices': 1, 'kind': 'FakeDevice', 'init_s': 0.1,"
            " 'compile_s': 0.2}))",
        )
        jobs = tmp_path / "jobs"
        jobs.mkdir()
        (jobs / ".serve.pid").write_text(str(os.getpid()))  # alive: us
        rc = main_mod.main([
            "doctor", "--jobs-dir", str(jobs),
            "--models-dir", str(tmp_path / "models"),
            "--timeout", "30",
        ])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "all checks passed" in out
        assert "FakeDevice" in out
        assert f"pid {os.getpid()} alive" in out
