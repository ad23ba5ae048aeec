"""Bench regression comparator (round-4 verdict item 6).

Compares a fresh ``bench.py`` sweep against the committed per-config
history in ``benchmarks.json`` and flags compute-path regressions.

Usage:
    python bench.py --all --iters 48 | tee /tmp/sweep.jsonl
    python tools/bench_compare.py /tmp/sweep.jsonl            # compare
    python tools/bench_compare.py /tmp/sweep.jsonl --update   # + append

Rules (the point is discriminating a real slowdown from relay weather):

* **Compute-bound rows** (everything not listed in ``relay_bound``):
  fresh value < (1 - threshold) x the newest committed same-backend
  entry => REGRESSION (exit 1). Default threshold 10%.
* **Relay-bound rows** (streamed / dispatch-latency-bound metrics whose
  honest value swings ~2x with tunnel load — e.g. the timelapse stream
  read 12.4 / 5.4 / 11.8 across three runs of identical code): compared
  against the *median* of ALL committed same-backend entries, failing
  only below half of it, and the row's own ``spread`` stamp (emitted by
  bench.py's median-of-5 measurement) is printed so the artifact reads
  as link diagnostics, not a compute regression.
* Rows with no committed history (new configs) are reported as NEW and
  never fail the gate; ``--update`` seeds them.

Cross-backend comparisons are skipped entirely: a CPU-fallback sweep
(relay outage) must not be graded against on-chip history.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY_PATH = os.path.join(REPO, "benchmarks.json")


def load_sweep(path: str):
    """Parse a bench.py output file: one JSON object per line, noise ok."""
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in row and "value" in row:
                rows.append(row)
    return rows


def compare(rows, history_doc, threshold: float):
    history = history_doc.get("history", {})
    relay_bound = set(history_doc.get("relay_bound", []))
    results = []  # (status, metric, message)
    for row in rows:
        metric, value = row["metric"], float(row["value"])
        backend = row.get("backend", "tpu")
        entries = [
            e for e in history.get(metric, []) if e.get("backend") == backend
        ]
        if not entries:
            results.append(("NEW", metric,
                            f"{value} {row.get('unit', '')} (no committed "
                            f"{backend} history)"))
            continue
        if metric in relay_bound:
            vals = sorted(float(e["value"]) for e in entries)
            med = vals[len(vals) // 2]
            ratio = value / med if med else float("inf")
            spread = row.get("spread")
            stamp = (f" spread[n={spread['n']} {spread['min']}-{spread['max']}"
                     f" rel_range={spread['rel_range']}]" if spread else "")
            if ratio < 0.5:
                results.append(("RELAY-LOW", metric,
                                f"{value} vs history median {med} "
                                f"({ratio:.2f}x){stamp} — below half the "
                                f"median even for a relay-bound row"))
            else:
                results.append(("RELAY-OK", metric,
                                f"{value} vs history median {med} "
                                f"({ratio:.2f}x){stamp}"))
            continue
        prev = float(entries[-1]["value"])
        ratio = value / prev if prev else float("inf")
        if ratio < 1.0 - threshold:
            results.append(("REGRESSION", metric,
                            f"{value} vs committed {prev} ({ratio:.2f}x, "
                            f"gate {1.0 - threshold:.2f}x)"))
        elif ratio > 1.0 + threshold:
            results.append(("IMPROVED", metric,
                            f"{value} vs committed {prev} ({ratio:.2f}x)"))
        else:
            results.append(("OK", metric,
                            f"{value} vs committed {prev} ({ratio:.2f}x)"))
    return results


def update_history(rows, history_doc, round_no):
    history = history_doc.setdefault("history", {})
    today = datetime.date.today().isoformat()
    for row in rows:
        entry = {
            "round": round_no,
            "date": today,
            "value": float(row["value"]),
            "unit": row.get("unit", ""),
            "backend": row.get("backend", "tpu"),
        }
        if "spread" in row:
            entry["spread"] = row["spread"]
        history.setdefault(row["metric"], []).append(entry)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sweep", help="bench.py output file (JSON lines)")
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="compute-row regression gate (default 10%%)")
    ap.add_argument("--update", action="store_true",
                    help="append the fresh sweep to benchmarks.json")
    ap.add_argument("--round", type=int, default=5, dest="round_no",
                    help="round number stamped on --update entries")
    ap.add_argument("--history", default=HISTORY_PATH,
                    help="path to benchmarks.json")
    args = ap.parse_args(argv)

    rows = load_sweep(args.sweep)
    if not rows:
        print(f"bench_compare: no bench rows found in {args.sweep}",
              file=sys.stderr)
        return 2
    with open(args.history) as fh:
        history_doc = json.load(fh)

    results = compare(rows, history_doc, args.threshold)
    width = max(len(m) for _, m, _ in results)
    n_bad = 0
    for status, metric, msg in results:
        print(f"{status:>10}  {metric:<{width}}  {msg}")
        if status in ("REGRESSION", "RELAY-LOW"):
            n_bad += 1
    print(f"bench_compare: {len(results)} rows, {n_bad} flagged")

    if args.update:
        update_history(rows, history_doc, args.round_no)
        with open(args.history, "w") as fh:
            json.dump(history_doc, fh, indent=1)
            fh.write("\n")
        print(f"bench_compare: history updated -> {args.history}")

    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
