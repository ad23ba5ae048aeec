"""End-to-end example: multi-position mosaic stitching.

Runs self-contained on CPU (or TPU if available):
    python examples/stitch_mosaic.py /tmp/sequitr_mosaic_demo

1. synthesizes a 2x3 grid of overlapping fields of view, cut from one
   band-limited scene with a couple of pixels of stage jitter per tile,
   a shared vignette, AND a photobleaching ramp (the three real-world
   imperfections stitching must solve for);
2. files a `stitch_mosaic` job with `flatfield` + `match_gains`: all
   horizontal seams phase-correlate in ONE batched dispatch (all
   vertical in a second), tile positions come from a weighted global
   least-squares solve, the shared shading profile and per-tile gains
   are divided/multiplied out, and the composite is feather-blended;
3. checks the recovered tile positions against the known jitter and
   prints the stitch-consistency QC metric (`rms_residual_px`) plus the
   estimated shading/gain ranges.

The natural upstream/downstream chain: stitch_mosaic -> segmentation
(the composite is just a big frame — tiled serving handles any size) ->
track_objects, all filed up front via `depends_on`. Multi-position LIVE
imaging (a fixed grid re-imaged every cycle) stitches with
`timelapse: true` — per-position T-page stacks stream into a T-page
mosaic with positions estimated once.
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


def make_tile_grid(tile_dir: str, r=2, c=3, h=160, w=160, ov=32, seed=0):
    """Cut an (r, c) grid of jittered overlapping tiles from one scene.
    Returns the true row-major tile origins."""
    import jax.numpy as jnp

    from sequitr_tpu.data import tiff
    from sequitr_tpu.ops import registration as reg

    from sequitr_tpu.data.synthetic import bandlimited_scene

    size = (
        (r - 1) * (h - ov) + h + 16,
        (c - 1) * (w - ov) + w + 16,
    )
    rng = np.random.default_rng(seed)
    scene = bandlimited_scene(size, rng)
    os.makedirs(tile_dir, exist_ok=True)
    # the optics: a shared vignette every tile sees identically
    yy = np.linspace(-1, 1, h)[:, None]
    xx = np.linspace(-1, 1, w)[None, :]
    vignette = (1.0 - 0.3 * (yy**2 + xx**2)).astype(np.float32)
    pos = []
    k = 0
    for ri in range(r):
        for ci in range(c):
            jy = jx = 0.0
            if (ri, ci) != (0, 0):
                jy, jx = rng.uniform(-2.0, 2.0, 2)  # stage jitter
            y0, x0 = ri * (h - ov) + 8 + jy, ci * (w - ov) + 8 + jx
            iy, ix = int(np.floor(y0)), int(np.floor(x0))
            shifted = np.asarray(
                reg.apply_shift(
                    jnp.asarray(scene),
                    jnp.asarray([iy - y0, ix - x0], jnp.float32),
                )
            )
            fade = 1.0 - 0.05 * k  # photobleaching across the scan
            tiff.write_stack(
                os.path.join(tile_dir, f"tile_{ri}_{ci}.tif"),
                (fade * vignette)[None]
                * shifted[None, iy : iy + h, ix : ix + w],
            )
            pos.append((y0, x0))
            k += 1
    return np.asarray(pos)


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

    tile_dir = os.path.join(base, "tiles")
    truth = make_tile_grid(tile_dir)

    out = os.path.join(base, "mosaic")
    client.jobs_lib.submit_job(
        cfg.jobs_dir,
        {
            "module": "stitch_mosaic",
            "params": {"grid": [2, 3], "overlap": 32, "refine": 3,
                       "flatfield": True, "match_gains": True},
            "input": [tile_dir],
            "output": out,
        },
    )
    assert ImageServer(cfg).poll_once()
    status = client.wait_for_job(out, timeout=120)
    assert status["state"] == "complete", status.get("error")

    metrics = json.loads(status["outputs"]["metrics"])
    print("stitch metrics:", metrics)

    got = np.loadtxt(
        status["outputs"]["positions"], delimiter=",", skiprows=1
    )[:, 3:]
    rel = truth - truth.min(axis=0, keepdims=True)
    worst = float(np.abs(got - rel).max())
    print(f"worst tile-position error vs truth: {worst:.4f} px")
    print(f"seam consistency (rms_residual_px): {metrics['rms_residual_px']}")
    print(
        f"shading profile range: [{metrics['flatfield_min']}, "
        f"{metrics['flatfield_max']}]; per-tile gains: "
        f"[{metrics['gain_min']}, {metrics['gain_max']}]"
    )
    assert worst < 0.05, "stage jitter should be recovered sub-pixel"
    assert metrics["gain_max"] / metrics["gain_min"] > 1.2  # the ramp
    print(f"mosaic written: {status['outputs']['mosaic']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sequitr_mosaic_demo")
