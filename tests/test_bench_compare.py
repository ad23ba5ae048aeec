"""Bench regression comparator tests (round-4 verdict item 6).

The committed ``benchmarks.json`` history plus ``tools/bench_compare.py``
must flag a deliberate compute-path slowdown while holding relay-bound
streamed rows to the dispersion-aware bar, not the 10% gate.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_compare  # noqa: E402


@pytest.fixture()
def history_doc():
    return {
        "relay_bound": ["stream_row"],
        "history": {
            "compute_row": [
                {"round": 4, "date": "2026-08-19", "value": 100.0,
                 "unit": "u", "backend": "tpu"},
            ],
            "stream_row": [
                {"round": 3, "date": "2026-08-17", "value": 12.0,
                 "unit": "u", "backend": "tpu"},
                {"round": 4, "date": "2026-08-17", "value": 5.0,
                 "unit": "u", "backend": "tpu"},
                {"round": 4, "date": "2026-08-19", "value": 11.0,
                 "unit": "u", "backend": "tpu"},
            ],
        },
    }


def _statuses(rows, doc, threshold=0.10):
    return {m: s for s, m, _ in bench_compare.compare(rows, doc, threshold)}


class TestCompare:
    def test_flags_deliberate_slowdown(self, history_doc):
        rows = [{"metric": "compute_row", "value": 50.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["compute_row"] == "REGRESSION"

    def test_within_gate_is_ok(self, history_doc):
        rows = [{"metric": "compute_row", "value": 95.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["compute_row"] == "OK"

    def test_improvement_reported(self, history_doc):
        rows = [{"metric": "compute_row", "value": 130.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["compute_row"] == "IMPROVED"

    def test_relay_row_2x_swing_not_a_regression(self, history_doc):
        # 6.0 vs median 11.0 is a 0.55x swing — exactly the honest
        # tunnel-load variance the relay rows show; must NOT flag
        rows = [{"metric": "stream_row", "value": 6.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["stream_row"] == "RELAY-OK"

    def test_relay_row_collapse_is_flagged(self, history_doc):
        rows = [{"metric": "stream_row", "value": 2.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["stream_row"] == "RELAY-LOW"

    def test_cross_backend_not_graded(self, history_doc):
        # a CPU-fallback sweep must not be graded against tpu history
        rows = [{"metric": "compute_row", "value": 0.3, "backend": "cpu"}]
        assert _statuses(rows, history_doc)["compute_row"] == "NEW"

    def test_new_config_never_fails(self, history_doc):
        rows = [{"metric": "brand_new", "value": 1.0, "backend": "tpu"}]
        assert _statuses(rows, history_doc)["brand_new"] == "NEW"


class TestCLI:
    def test_end_to_end_exit_codes_and_update(self, tmp_path, history_doc):
        hist = tmp_path / "benchmarks.json"
        hist.write_text(json.dumps(history_doc))
        sweep = tmp_path / "sweep.jsonl"
        sweep.write_text(
            "WARNING: noise line the parser must skip\n"
            + json.dumps({"metric": "compute_row", "value": 40.0,
                          "unit": "u", "backend": "tpu"}) + "\n"
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
             str(sweep), "--history", str(hist), "--update", "--round", "5"],
            capture_output=True, text=True,
        )
        assert proc.returncode == 1, proc.stdout + proc.stderr
        assert "REGRESSION" in proc.stdout
        updated = json.loads(hist.read_text())
        assert updated["history"]["compute_row"][-1]["value"] == 40.0
        assert updated["history"]["compute_row"][-1]["round"] == 5

    def test_clean_sweep_exits_zero(self, tmp_path, history_doc):
        hist = tmp_path / "benchmarks.json"
        hist.write_text(json.dumps(history_doc))
        sweep = tmp_path / "sweep.jsonl"
        sweep.write_text(json.dumps(
            {"metric": "compute_row", "value": 101.0, "unit": "u",
             "backend": "tpu"}) + "\n")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
             str(sweep), "--history", str(hist)],
            capture_output=True, text=True,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr


class TestCommittedHistory:
    def test_committed_history_loads_and_covers_the_north_star(self):
        with open(os.path.join(REPO, "benchmarks.json")) as fh:
            doc = json.load(fh)
        assert "unet2d_1024_inference" in doc["history"]
        for metric, entries in doc["history"].items():
            for e in entries:
                assert e["value"] > 0, metric
                assert e["backend"] in ("tpu", "cpu"), metric
