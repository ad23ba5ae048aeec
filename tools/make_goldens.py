"""Generate the committed golden files under ``tests/goldens/``.

Round-4 verdict item 2: through round 3, on-chip goldens were recomputed
from the CPU-f32 path each run, so an op-semantics change that shifts BOTH
paths together (e.g. a jax upgrade changing a lowering) passed silently.
These npz files freeze each graph family's outputs on fixed inputs and
fixed weights (the committed trained fixtures where available, PRNGKey(0)
init elsewhere); ``tests/test_goldens.py`` compares fresh recomputation
against the committed bytes with tight tolerances — a deliberate one-ULP
change in a core op fails the suite.

Everything is generated CPU-pinned float32 (the suite's platform, so the
comparison is apples-to-apples; the TPU lane keeps its separate
bf16-vs-CPU cross-checks):

    python tools/make_goldens.py            # all families
    python tools/make_goldens.py --only unet2d_infer gan_generator

Regenerate ONLY when an output change is intended and understood; the
point of the files is that silent drift fails loudly.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)


def _save(name: str, **arrays) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    kb = os.path.getsize(path) / 1024
    print(f"{name}: {', '.join(sorted(arrays))} ({kb:.0f} KiB)")


def make_unet2d_infer():
    """Fused whole-frame AND tiled 2D inference on the trained teacher."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.pipeline import infer as infer_lib

    _, cfg, params, state, _ = fixtures.load("unet2d_cells")
    img, _ = synthetic.cells_frame(31_337, (128, 128))
    tc = infer_lib.TileConfig(patch=(128, 128), overlap=(0, 0), normalize="exact")
    probs, labels = infer_lib.make_frame_inferrer(cfg, tc, (128, 128))(
        params, state, jnp.asarray(img)
    )
    # tiled: 96/32 grid exercises tile + hann stitch-blend on the same frame
    tc_t = infer_lib.TileConfig(patch=(96, 96), overlap=(32, 32), normalize="exact")
    probs_t, labels_t = infer_lib.make_frame_inferrer(cfg, tc_t, (128, 128))(
        params, state, jnp.asarray(img)
    )
    _save(
        "unet2d_infer", image=img,
        probs=np.asarray(probs, np.float32), labels=np.asarray(labels),
        probs_tiled=np.asarray(probs_t, np.float32),
        labels_tiled=np.asarray(labels_t),
    )


def make_unet3d_infer():
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.pipeline import infer as infer_lib

    _, cfg, params, state, _ = fixtures.load("unet3d_cells")
    vol, _ = synthetic.cells_volume(31_338, (8, 64, 64))
    tc = infer_lib.TileConfig(patch=(8, 64, 64), overlap=(0, 0, 0), normalize="exact")
    probs, labels = infer_lib.make_frame_inferrer(cfg, tc, (8, 64, 64))(
        params, state, jnp.asarray(vol)
    )
    # float16 storage halves the file; the test tolerance (2e-3) still
    # catches any real semantic change
    _save(
        "unet3d_infer", volume=vol,
        probs=np.asarray(probs, np.float16), labels=np.asarray(labels),
    )


def make_gan_generator():
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures, gan as gan_lib
    from sequitr_tpu.pipeline import infer as infer_lib

    try:
        _, cfg, params, state, _ = fixtures.load("gan_denoise")
    except KeyError:
        print("gan_generator: SKIPPED (gan_denoise fixture not trained yet)")
        return
    fcfg, fparams, fstate = gan_lib.fold_generator(cfg, params, state)
    img, _ = synthetic.cells_frame(31_339, (128, 128))
    tc = infer_lib.TileConfig(patch=(128, 128), overlap=(0, 0), normalize="exact")
    x = infer_lib._normalize(jnp.asarray(img)[..., None], tc)[None]
    y, _ = gan_lib.generator_apply(fcfg, fparams, fstate, x)
    _save(
        "gan_generator", image=img,
        output=np.asarray(y[0, ..., 0], np.float32),
    )


def make_n2v_denoiser():
    """The Noise2Void regression graph on the trained fixture: one fixed
    noisy scene through the exact serving pass (BN folded in-graph)."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.pipeline import infer as infer_lib

    try:
        _, cfg, params, state, _ = fixtures.load("n2v_cells")
    except KeyError:
        print("n2v_denoiser: SKIPPED (n2v_cells fixture not trained yet)")
        return
    _, noisy = synthetic.denoise_pair(77_117, (128, 128))
    tc = infer_lib.TileConfig(patch=(128, 128), overlap=(0, 0), normalize="none")
    den = jax.jit(infer_lib.make_denoiser(cfg, tc, (128, 128)))
    out = den(params, state, jnp.asarray(noisy))
    _save(
        "n2v_denoiser", noisy=noisy,
        output=np.asarray(out[..., 0], np.float32),
    )


def make_flows_segment():
    """The flow-field family golden: (a) diffusion flow TARGETS on a fixed
    instance map (pure host numpy — compares effectively exact) and
    (b) the fused serving pass (forward + Euler integration) on the
    trained fixture + the grouped instance map."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.pipeline import infer as infer_lib

    try:
        _, cfg, params, state, _ = fixtures.load("flows_cells")
    except KeyError:
        print("flows_segment: SKIPPED (flows_cells fixture not trained yet)")
        return
    img, lab = synthetic.instances_frame(88_221, (128, 128))
    t_flow, t_prob = flows_ops.flow_targets(lab)
    tc = infer_lib.TileConfig(
        patch=(128, 128), overlap=(0, 0), normalize="exact"
    )
    seg = jax.jit(infer_lib.make_flows_segmenter(cfg, tc, (128, 128)))
    final, prob = seg(params, state, jnp.asarray(img))
    final = np.asarray(final, np.float32)
    prob = np.asarray(prob, np.float32)
    inst = flows_ops.group_sinks(final, prob > 0.5)
    _save(
        "flows_segment",
        image=img, labels=lab.astype(np.int32),
        targets_flow=t_flow, targets_prob=t_prob,
        final=final, prob=prob, instances=inst.astype(np.int32),
    )


def make_stars_predict():
    """The star-convex family golden: (a) ray-distance + normalized-EDT
    TARGETS on a fixed instance map (pure host numpy — compares
    effectively exact) and (b) the fused serving pass (forward +
    sigmoid/clamp) on the trained fixture + the NMS'd instance map."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.ops import stardist as sd
    from sequitr_tpu.pipeline import infer as infer_lib

    try:
        _, cfg, params, state, _ = fixtures.load("stars_cells")
    except KeyError:
        print("stars_predict: SKIPPED (stars_cells fixture not trained yet)")
        return
    img, lab = synthetic.instances_frame(88_221, (128, 128))
    t_dist, t_prob = sd.star_targets(lab)
    tc = infer_lib.TileConfig(
        patch=(128, 128), overlap=(0, 0), normalize="exact"
    )
    pred = jax.jit(infer_lib.make_stars_predictor(cfg, tc, (128, 128)))
    prob, dist = pred(params, state, jnp.asarray(img))
    prob = np.asarray(prob, np.float32)
    dist = np.asarray(dist, np.float32)
    inst = sd.instances_from_rays(prob, dist)
    _save(
        "stars_predict",
        image=img, labels=lab.astype(np.int32),
        targets_dist=t_dist, targets_prob=t_prob,
        prob=prob, dist=dist, instances=inst.astype(np.int32),
    )


def make_train2d_losses():
    """Loss trajectory of 4 deterministic train steps from PRNGKey(0) init.

    Covers init + weighted-CE loss + backward + adam update in one golden;
    augmentation is deliberately OFF (it has its own golden below)."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import unet
    from sequitr_tpu.pipeline import train as train_lib

    cfg = unet.UNetConfig(
        in_channels=1, num_classes=3, depth=3, base_features=16,
        compute_dtype=jnp.float32,
    )
    tc = train_lib.TrainConfig(augment=False)
    state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
    step = train_lib.make_unet_train_step(cfg, tc)
    losses = []
    key = jax.random.PRNGKey(1)
    for s in range(4):
        imgs, labs = [], []
        for b in range(2):
            img, lab = synthetic.cells_frame(50_000 + s * 2 + b, (64, 64))
            lo, hi = np.percentile(img, [5.0, 99.5])
            imgs.append(np.clip((img - lo) / (hi - lo), 0, 1).astype(np.float32))
            labs.append(lab)
        batch = {
            "image": jnp.asarray(np.stack(imgs))[..., None],
            "labels": jnp.asarray(np.stack(labs), jnp.int32),
            "weights": jnp.ones((2, 64, 64), jnp.float32),
        }
        state, metrics = step(state, batch, jax.random.fold_in(key, s))
        losses.append(float(metrics["loss"]))
    _save("train2d_losses", losses=np.asarray(losses, np.float64))


def make_augment_elastic():
    """One fixed-key full augmentation (flip+rot90+elastic ON)."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.ops import augment

    img, lab = synthetic.cells_frame(60_001, (96, 96))
    w = np.linspace(0, 1, 96 * 96, dtype=np.float32).reshape(96, 96)
    out = augment.augment_example(
        jax.random.PRNGKey(7), jnp.asarray(img)[..., None],
        jnp.asarray(lab), jnp.asarray(w), p_elastic=1.0,
    )
    a_img, a_lab, a_w = out
    _save(
        "augment_elastic",
        image=np.asarray(a_img, np.float32), labels=np.asarray(a_lab),
        weights=np.asarray(a_w, np.float32),
    )


def make_normalize_quantiles():
    """Exact (sort) and fast (histogram) percentile paths on one frame."""
    from sequitr_tpu.data import synthetic
    from sequitr_tpu.ops import normalize as norm_ops

    img, _ = synthetic.cells_frame(70_001, (256, 256))
    x = jnp.asarray(img)[..., None]
    flat = x.reshape(-1, 1)
    qs = jnp.asarray([0.05, 0.995], jnp.float32)
    lohi_exact = np.asarray(
        [np.percentile(img, 5.0), np.percentile(img, 99.5)], np.float64
    )
    lohi_fast = np.asarray(
        norm_ops.histogram_quantiles(flat, qs, bins=4096), np.float64
    )[:, 0]
    out_exact = np.asarray(norm_ops.percentile_normalize(x, 5.0, 99.5), np.float32)
    _save(
        "normalize_quantiles",
        lohi_exact=lohi_exact, lohi_fast=lohi_fast, normalized=out_exact,
    )


def make_register_step():
    """One fused streaming-registration step (2D) and one volumetric
    batch estimate on fixed band-limited scenes with a known sub-pixel
    shift — freezes the phase-correlation estimator's numerics (window,
    whitening, refine passes, parabolic fit, Fourier resample)."""
    from sequitr_tpu.ops import registration as reg

    rng = np.random.default_rng(80_001)
    f = np.fft.fft2(rng.normal(0, 1, (96, 96)))
    fy = np.fft.fftfreq(96)[:, None]
    fx = np.fft.fftfreq(96)[None, :]
    base = (
        np.fft.ifft2(f * np.exp(-(fy**2 + fx**2) / (2 * 0.08**2))).real * 50
        + 120
    ).astype(np.float32)
    mov = np.asarray(
        reg.apply_shift(jnp.asarray(base), jnp.asarray([2.3, -1.7]))
    )
    anchor = jnp.fft.fftn(jnp.asarray(base) * reg.hann_window(base.shape))
    _, cum, corr, _, resp = reg.register_step(
        anchor, jnp.asarray(mov), jnp.zeros(2)
    )
    # volumetric batch: 3 drifted copies of a (8, 32, 32) scene
    f3 = np.fft.fftn(rng.normal(0, 1, (8, 32, 32)))
    grids = np.meshgrid(
        *[np.fft.fftfreq(n) for n in (8, 32, 32)], indexing="ij"
    )
    r2 = sum(g**2 for g in grids)
    vol = (
        np.fft.ifftn(f3 * np.exp(-r2 / (2 * 0.12**2))).real * 50 + 120
    ).astype(np.float32)
    vols = jnp.stack(
        [
            reg.apply_shift(
                jnp.asarray(vol), jnp.asarray([0.4 * k, 0.9 * k, -0.6 * k])
            )
            for k in range(3)
        ]
    )
    shifts3, resps3, _ = reg.register_batch(
        jnp.asarray(vol), vols, resample=False
    )
    _save(
        "register_step",
        shift=np.asarray(cum, np.float32),
        response=np.asarray(resp, np.float32),
        corrected=np.asarray(corr, np.float32),
        shifts3=np.asarray(shifts3, np.float32),
        responses3=np.asarray(resps3, np.float32),
    )


def make_localize3d_step():
    """Volumetric + astigmatic emitter localization on fixed scenes —
    freezes the 3D detector tie-break, the anisotropic Gaussian-mask
    centroid, the adaptive elliptical width fit and the z-inversion
    grid numerics."""
    from sequitr_tpu import psf
    from sequitr_tpu.data import synthetic

    vol, _ = synthetic.emitter_volume(90_001, (12, 64, 64), n=8)
    zyx, valid, fits = psf._detect_and_fit_3d(
        jnp.asarray(vol), jnp.float32(120.0), max_peaks=16,
        min_distance=2, min_distance_z=1, window=7, window_z=5,
        sigma=1.4, sigma_z=1.6,
    )
    v = np.asarray(valid)
    out3d = {
        f"vol_{k}": np.asarray(val)[v].astype(np.float32)
        for k, val in fits.items()
    }

    # astigmatic: fixed elliptical spots + a fixed analytic calibration
    rng = np.random.default_rng(90_002)
    yy, xx = np.mgrid[:64, :64].astype(np.float64)
    frame = np.full((64, 64), 20.0)
    for cz, cy, cx in [(250.0, 20.5, 40.2), (-380.0, 45.1, 18.7)]:
        sx = 1.3 * np.sqrt(1.0 + ((cz - 300.0) / 400.0) ** 2)
        sy = 1.3 * np.sqrt(1.0 + ((cz + 300.0) / 400.0) ** 2)
        frame += 3000.0 / (2 * np.pi * sx * sy) * np.exp(
            -((yy - cy) ** 2) / (2 * sy**2) - ((xx - cx) ** 2) / (2 * sx**2)
        )
    frame = (frame + rng.normal(0, 0.2, frame.shape)).astype(np.float32)
    calib = psf.AstigCalibration(
        qx=(1.05625e-05, -0.0063375, 2.640625),
        qy=(1.05625e-05, 0.0063375, 2.640625),
        z_range=(-600.0, 600.0),
    )
    astig = psf.localize_emitters_astig(frame, 40.0, calib)
    _save(
        "localize3d_step",
        **out3d,
        **{f"astig_{k}": np.asarray(v2, np.float32)
           for k, v2 in astig.items()},
    )


def make_mosaic_stitch():
    """Mosaic stitcher numerics frozen: batched strip correlator, global
    least-squares solve, fractional Fourier placement and feather blend.
    The INPUT TILES are stored in the npz too, so the test re-runs the
    stitch on committed bytes — the fixture cannot drift from its own
    generator."""
    from sequitr_tpu import mosaic
    from sequitr_tpu.data.synthetic import bandlimited_scene
    from sequitr_tpu.ops import registration as reg

    rng = np.random.default_rng(100_001)
    scene = bandlimited_scene((300, 300), rng)
    tiles = []
    h = w = 140
    for ri in range(2):
        for ci in range(2):
            jy = jx = 0.0
            if (ri, ci) != (0, 0):
                jy, jx = rng.uniform(-2.0, 2.0, 2)
            y0, x0 = ri * 116 + 8 + jy, ci * 116 + 8 + jx
            iy, ix = int(np.floor(y0)), int(np.floor(x0))
            shifted = np.asarray(
                reg.apply_shift(
                    jnp.asarray(scene),
                    jnp.asarray([iy - y0, ix - x0], jnp.float32),
                )
            )
            tiles.append(shifted[iy : iy + h, ix : ix + w])
    tiles = np.stack(tiles).astype(np.float32)
    res = mosaic.stitch_grid(tiles, (2, 2), overlap=24)
    _save(
        "mosaic_stitch",
        tiles=tiles,
        positions=res.positions.astype(np.float32),
        offsets=res.offsets.astype(np.float32),
        responses=res.responses.astype(np.float32),
        mosaic=res.mosaic,
    )


FAMILIES = {
    "unet2d_infer": make_unet2d_infer,
    "unet3d_infer": make_unet3d_infer,
    "gan_generator": make_gan_generator,
    "n2v_denoiser": make_n2v_denoiser,
    "flows_segment": make_flows_segment,
    "stars_predict": make_stars_predict,
    "train2d_losses": make_train2d_losses,
    "augment_elastic": make_augment_elastic,
    "normalize_quantiles": make_normalize_quantiles,
    "register_step": make_register_step,
    "localize3d_step": make_localize3d_step,
    "mosaic_stitch": make_mosaic_stitch,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None, choices=sorted(FAMILIES))
    args = ap.parse_args()
    for name in args.only or sorted(FAMILIES):
        FAMILIES[name]()


if __name__ == "__main__":
    main()
