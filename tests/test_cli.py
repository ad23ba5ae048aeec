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
