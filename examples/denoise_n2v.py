"""Noise2Void example: train a denoiser from NOISY data alone, then serve.

The pix2pix enhancer (examples/enhance_denoise.py) needs paired clean
targets; most microscopy has none. Noise2Void's blind-spot training
(``train_n2v``) learns the denoiser from the noisy acquisition itself —
this demo trains on a noisy synthetic timelapse and scores the output
against the clean render the training never saw.

Runs self-contained on CPU (or TPU):
    python examples/denoise_n2v.py /tmp/sequitr_n2v_demo
"""

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

# smoke-lane step cap (tests/test_examples.py): SEQUITR_EXAMPLE_STEPS=N
# truncates training so the lane catches API rot fast; quality bars that
# need a converged model are skipped when the cap is active
_CAP = int(os.environ.get("SEQUITR_EXAMPLE_STEPS", "0"))


def _steps(n):
    return min(n, _CAP) if _CAP else n



def main(base: str):
    from sequitr_tpu import client
    from sequitr_tpu.config import ServerConfiguration
    from sequitr_tpu.data import synthetic, tiff
    from sequitr_tpu.server import ImageServer

    os.makedirs(base, exist_ok=True)
    cfg = ServerConfiguration(
        jobs_dir=os.path.join(base, "jobs"), models_dir=os.path.join(base, "models")
    )
    cfg.ensure_dirs()
    server = ImageServer(cfg)

    # a noisy timelapse with a known clean truth (only for scoring — the
    # training below sees the noisy stack ONLY)
    pairs = [synthetic.denoise_pair(100 + t, (64, 64)) for t in range(24)]
    clean = np.stack([c for c, _ in pairs])
    noisy = np.stack([x for _, x in pairs])
    noisy_p = os.path.join(base, "noisy.tif")
    tiff.write_stack(noisy_p, noisy)

    def run(spec):
        client.jobs_lib.submit_job(cfg.jobs_dir, spec)
        assert server.poll_once(), "no job claimed"
        return client.wait_for_job(spec["output"], timeout=300)

    status = run(
        {
            "module": "train_n2v",
            "params": {
                "model": "demo_n2v",
                "patch": [64, 64],
                "patches_per_frame": 1,
                "steps": _steps(250),
                "batch_size": 8,
                "learning_rate": 3e-3,
                "mask_frac": 0.02,
                "radius": 4,
                "lr_schedule": "cosine",
                "depth": 2,
                "base_features": 12,
                "compute_dtype": "float32",
                # denoise_pair scenes are pre-scaled: train raw + serve
                # with normalize "none" so both sides share one space
                "normalize": False,
                "holdout_every": 8,
                "keep_best": True,
            },
            "input": [noisy_p],
            "output": os.path.join(base, "train"),
        }
    )
    print("trained:", status["outputs"]["model"])

    status = run(
        {
            "module": "denoise",
            # denoise_pair scenes already live in the trained scale; raw
            # microscopy stacks would keep the default percentile normalize
            "params": {"model": "demo_n2v", "normalize": "none"},
            "input": [noisy_p],
            "output": os.path.join(base, "serve"),
        }
    )
    out = np.asarray(tiff.read_stack(status["outputs"]["denoised"]))

    def psnr(a, b):
        return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-12))

    print(
        f"PSNR vs clean truth: noisy input {psnr(noisy, clean):.1f} dB "
        f"-> denoised {psnr(out, clean):.1f} dB"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sequitr_n2v_demo")
