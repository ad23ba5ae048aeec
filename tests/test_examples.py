"""Examples smoke lane (round-4 verdict item 5).

Every ``examples/*.py`` is a runnable end-to-end walkthrough; nothing
else in the suite imported them, so an API rename could rot all 17
silently. This lane executes each one in a subprocess against a tmp
workspace with training truncated via ``SEQUITR_EXAMPLE_STEPS`` — the
goal is catching breakage (import errors, renamed params, changed job
schemas), not model quality, so examples skip converged-model quality
bars when the cap is active.
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))

# per-example wall bound; generous because each subprocess pays its own
# jax import + CPU compile (measured ~40-70 s for the training examples)
TIMEOUT_S = 420


def test_lane_covers_every_example():
    """A new example is automatically in the lane; keep this honest."""
    assert len(EXAMPLES) >= 17


@pytest.mark.parametrize(
    "script", EXAMPLES, ids=[os.path.basename(p)[:-3] for p in EXAMPLES]
)
def test_example_runs(script, tmp_path):
    env = dict(
        os.environ,
        SEQUITR_FORCE_CPU="1",
        JAX_PLATFORMS="cpu",
        SEQUITR_EXAMPLE_STEPS="20",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    proc = subprocess.run(
        [sys.executable, script, str(tmp_path / "ws")],
        capture_output=True, text=True, timeout=TIMEOUT_S, env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(script)} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}"
    )
