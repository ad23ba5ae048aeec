"""End-to-end example: drift correction + job chaining via depends_on.

Runs self-contained on CPU (or TPU if available):
    python examples/register_and_chain.py /tmp/sequitr_chain_demo

1. synthesizes a drifting fluorescence-like timelapse (the microscope
   stage creeps a little every frame);
2. files a whole two-step workflow UP FRONT — a `register_stack` job
   and, chained on its completion via `depends_on`, a second
   `register_stack` in estimate-only mode over the OUTPUT — no
   client-side polling between steps;
3. the server resolves the chain in order; the second job's shifts.csv
   is the residual drift of the registered stack (~zero = success).

The same pattern chains register -> segment -> track_objects: each
job's `depends_on` names the previous job's output dir, and a failed or
cancelled step cascade-fails its dependents instead of leaving them
queued forever.
"""

import json
import os
import sys

# allow running straight from a source checkout: python examples/<name>.py
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# honor JAX_PLATFORMS=cpu / SEQUITR_FORCE_CPU even where a sitecustomize
# force-registers a TPU platform (it overrides the env var, so pin the
# jax config value itself before any backend initializes)
if os.environ.get("SEQUITR_FORCE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_drifting_stack(path: str, t: int = 8, size: int = 96, seed: int = 0):
    """Band-limited scene translated by ~1 px/frame (Fourier-exact)."""
    import jax.numpy as jnp

    from sequitr_tpu.data import tiff
    from sequitr_tpu.ops import registration as reg

    from sequitr_tpu.data.synthetic import bandlimited_scene

    rng = np.random.default_rng(seed)
    base = bandlimited_scene((size, size), rng)
    frames = [
        np.asarray(
            reg.apply_shift(
                jnp.asarray(base), jnp.asarray([0.8 * k, -0.5 * k])
            )
        )
        for k in range(t)
    ]
    tiff.write_stack(path, np.stack(frames))


def main(base: str):
    from sequitr_tpu import client
    from sequitr_tpu.config import ServerConfiguration
    from sequitr_tpu.server import ImageServer

    os.makedirs(base, exist_ok=True)
    cfg = ServerConfiguration(
        jobs_dir=os.path.join(base, "jobs"),
        models_dir=os.path.join(base, "models"),
    )
    cfg.ensure_dirs()
    server = ImageServer(cfg)

    stack_path = os.path.join(base, "drifting.tif")
    make_drifting_stack(stack_path)

    reg_out = os.path.join(base, "registered")
    resid_out = os.path.join(base, "residual")

    # file BOTH jobs up front — submission order doesn't matter; the
    # second stays queued until reg_out holds a complete status.json
    # (`python -m sequitr_tpu submit --after <dir>` does the same)
    client.jobs_lib.submit_job(
        cfg.jobs_dir,
        {
            "module": "register_stack",
            "params": {"mode": "previous", "crop": True},
            "input": [stack_path],
            "output": reg_out,
        },
    )
    client.jobs_lib.submit_job(
        cfg.jobs_dir,
        {
            "module": "register_stack",
            "params": {"estimate_only": True},
            "input": [os.path.join(reg_out, "registered.tif")],
            "output": resid_out,
            "depends_on": reg_out,
        },
    )

    # the server works the chain in dependency order
    assert server.poll_once(), "registration job should claim first"
    assert server.poll_once(), "residual job should claim once unblocked"
    status = client.wait_for_job(resid_out, timeout=60)
    assert status["state"] == "complete", status.get("error")

    reg_metrics = json.load(
        open(os.path.join(reg_out, "status.json"))
    )["outputs"]["metrics"]
    print("registration:", reg_metrics)

    resid = np.loadtxt(
        os.path.join(resid_out, "shifts.csv"),
        delimiter=",", skiprows=1, usecols=(1, 2),
    )
    worst = float(np.abs(resid).max())
    print(f"residual drift of the registered stack: {worst:.4f} px/frame")
    assert worst < 0.05, "registered stack should be stationary"
    print("chain complete: register -> verify, no client-side polling")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sequitr_chain_demo")
