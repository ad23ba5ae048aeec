"""Shared helpers for the real-subprocess e2e tests (drain/soak/etc.)."""

import json
import os

# the repo root, wherever this checkout lives (worker subprocesses import
# the package by cwd)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_state(out_dir):
    """A job's terminal/running state from its status.json, else None."""
    p = out_dir / "status.json"
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text()).get("state")
    except ValueError:
        return None  # mid-write
