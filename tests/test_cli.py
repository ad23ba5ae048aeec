"""CLI tests: python -m sequitr_tpu submit/status (in-process)."""

import json
import os

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
