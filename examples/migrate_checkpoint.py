"""End-to-end migration workflow: external weights -> served, validated model.

Runs self-contained on CPU (or TPU if available):
    python examples/migrate_checkpoint.py /tmp/sequitr_migrate

Simulates migrating a TF-1.x sequitr checkpoint:
1. builds a "foreign" checkpoint: a flat npz whose transposed-conv kernels
   use TF's (k, k, c_out, c_in) layout (what dumping reference variables
   produces);
2. registers it with the CLI: `import-model --layout tf` (kernel maps from
   `models/convert.py`; batch-norm running stats ride a state/ prefix);
3. VALIDATES it through the job API with the `parity_check` pipeline —
   identical weights through our jax path and the independent torch
   re-derivation, failing deterministically on divergence;
4. serves a segmentation job with the migrated model.
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


def main(base: str):
    import jax
    import jax.numpy as jnp

    from sequitr_tpu import client
    from sequitr_tpu.__main__ import main as cli
    from sequitr_tpu.config import ServerConfiguration
    from sequitr_tpu.data import tiff
    from sequitr_tpu.models import convert as convert_lib
    from sequitr_tpu.models import unet
    from sequitr_tpu.server import ImageServer

    os.makedirs(base, exist_ok=True)
    models = os.path.join(base, "models")

    # 1. a "foreign" trained checkpoint (random weights stand in), dumped
    # flat with TF-layout transposed-conv kernels + BN running stats
    cfg = unet.UNetConfig(
        in_channels=1, num_classes=3, depth=3, base_features=8, norm="batch",
    )
    params, state = unet.init(jax.random.PRNGKey(0), cfg)
    state = jax.tree.map(
        lambda a: a + 0.1 * np.random.default_rng(1).random(a.shape).astype(np.float32),
        state,
    )
    flat = {
        k: (convert_lib.tf_transpose_kernel_to_jax(v)  # involution: to TF layout
            if "/up/" in f"/{k}/" and k.endswith("/w") and v.ndim >= 4 else v)
        for k, v in convert_lib.flatten_params(params).items()
    }
    flat.update({
        f"state/{k}": v for k, v in convert_lib.flatten_params(state).items()
    })
    npz = os.path.join(base, "tf_checkpoint.npz")
    np.savez(npz, **flat)

    # 2. register through the CLI
    arch = os.path.join(base, "arch.json")
    with open(arch, "w") as f:
        json.dump({"in_channels": 1, "num_classes": 3, "depth": 3,
                   "base_features": 8, "norm": "batch"}, f)
    assert cli(["import-model", "--models-dir", models, "--npz", npz,
                "--arch", arch, "--layout", "tf", "migrated"]) == 0
    print("registered: migrated")

    # 3. validate through the job API
    srv_cfg = ServerConfiguration(
        jobs_dir=os.path.join(base, "jobs"), models_dir=models
    )
    srv_cfg.ensure_dirs()
    server = ImageServer(srv_cfg)

    def run(spec):
        client.jobs_lib.submit_job(srv_cfg.jobs_dir, spec)
        assert server.poll_once()
        return client.wait_for_job(spec["output"], timeout=300)

    status = run({
        "module": "parity_check",
        "params": {"model": "migrated", "reference": "torch",
                   "spatial": [32, 32]},
        "input": [], "output": os.path.join(base, "parity"),
    })
    print("parity:", status["outputs"]["metrics"])

    # 4. serve with the migrated model
    rng = np.random.default_rng(2)
    stack_path = os.path.join(base, "stack.tif")
    tiff.write_stack(
        stack_path, (rng.random((2, 64, 64)) * 60000).astype(np.uint16)
    )
    status = run({
        "module": "segmentation_unet2d",
        "params": {"model": "migrated", "patch": [32, 32], "overlap": [8, 8]},
        "input": [stack_path], "output": os.path.join(base, "seg"),
    })
    print("serving metrics:", json.loads(status["outputs"]["metrics"]))
    print("migration complete: converted -> registered -> validated -> served")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sequitr_migrate")
