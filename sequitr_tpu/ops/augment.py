"""On-device training augmentation: flip, rotation, elastic deformation.

sequitr augments (image, label, weight-map) examples with random flips,
rotations and elastic deformations inside its input pipeline (SURVEY.md §2
'Augmentation'; BASELINE.json config #3). Reference source unavailable —
parameterizations below are the standard ones (Simard-style elastic warp)
and documented as spec decisions.

TPU-first design notes
----------------------
* Everything is pure jax over explicit PRNG keys, shape-static, jit- and
  vmap-safe, so augmentation runs fused inside the training step on device
  rather than on the host input pipeline (the reference does it in the TF
  input pipeline on CPU).
* Discrete flips/rotations use ``jnp.where``/``lax.switch`` on random bits
  (no data-dependent Python control flow).
* Elastic deformation samples a coarse control-point displacement field,
  upsamples it with ``jax.image.resize`` (the jax analogue of a Gaussian-
  smoothed dense field) and warps with a single quad-corner gather
  (``_quad_warp``): the four bilinear corners of every pixel are pre-packed
  by edge-clamped shifts so the whole (image, weights, labels) warp is ONE
  flat ``take`` — measured 4.75x the four-narrow-takes form on TPU.
  Labels ride the same gather with nearest-neighbor corner selection to
  stay integral.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "random_flip",
    "random_rot90",
    "elastic_fields",
    "elastic_warp",
    "photometric_jitter",
    "augment_example",
]


def photometric_jitter(
    key: jax.Array,
    image: jnp.ndarray,
    gain_jitter: float = 0.0,
    offset_jitter: float = 0.0,
    noise_std: float = 0.0,
) -> jnp.ndarray:
    """Intensity augmentation: per-channel gain/offset + pixel noise.

    Microscopy intensity is not a feature — illumination drifts, exposure
    varies between sessions, detectors add shot/read noise — so the net
    should be invariant to it. Per CHANNEL (independent fluorophores have
    unrelated scales): gain is log-uniform in ``[1/(1+g), 1+g]``
    (multiplicatively symmetric — a 1.25x brightening is as likely as its
    inverse), offset ~ N(0, offset_jitter); per PIXEL: additive Gaussian
    ``noise_std``. All knobs default OFF (0.0 = exact identity, so
    existing training graphs are bit-unchanged). Applied to the IMAGE
    only — labels/weights are geometry, not photometry. jit/vmap-safe;
    records store [0, 1]-normalized intensities, so the jitter scales are
    fractions of that range.
    """
    k_gain, k_off, k_noise = jax.random.split(key, 3)
    c = image.shape[-1]
    out = image
    if gain_jitter > 0:
        hi = jnp.log1p(gain_jitter)
        gain = jnp.exp(
            jax.random.uniform(k_gain, (c,), minval=-hi, maxval=hi)
        )
        out = out * gain
    if offset_jitter > 0:
        out = out + jax.random.normal(k_off, (c,)) * offset_jitter
    if noise_std > 0:
        out = out + jax.random.normal(k_noise, out.shape) * noise_std
    return out


def random_flip(key: jax.Array, *arrays: jnp.ndarray, axes: Tuple[int, ...] = (0, 1)):
    """Apply the same random flips along ``axes`` to every array."""
    bits = jax.random.bernoulli(key, shape=(len(axes),))
    outs = []
    for a in arrays:
        for bit, ax in zip(bits, axes):
            a = jnp.where(bit, jnp.flip(a, axis=ax), a)
        outs.append(a)
    return outs[0] if len(outs) == 1 else tuple(outs)


def random_rot90(key: jax.Array, *arrays: jnp.ndarray, axes: Tuple[int, int] = (0, 1)):
    """Apply the same random k*90-degree rotation (k in 0..3) to every array.

    Requires the two rotated axes to have equal length (square patches),
    which holds for sequitr's square training patches.
    """
    k = jax.random.randint(key, (), 0, 4)
    outs = []
    for a in arrays:
        outs.append(
            jax.lax.switch(k, [lambda x, r=r: jnp.rot90(x, r, axes=axes) for r in range(4)], a)
        )
    return outs[0] if len(outs) == 1 else tuple(outs)


def elastic_fields(
    key: jax.Array,
    shape: Tuple[int, int],
    alpha: float = 20.0,
    grid: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a smooth per-pixel displacement field (dy, dx) for ``shape``.

    A ``grid`` x ``grid`` control lattice of N(0,1) displacements scaled by
    ``alpha`` (pixels) is bicubic-upsampled to full resolution — equivalent
    in spirit to the classic Gaussian-filtered noise field but expressible
    as one dense resize that XLA maps onto the MXU/VPU (spec decision).
    """
    h, w = shape
    ctrl = jax.random.normal(key, (2, grid, grid), dtype=jnp.float32) * alpha
    field = jax.image.resize(ctrl, (2, h, w), method="bicubic")
    return field[0], field[1]


def _shift_cols(a: jnp.ndarray) -> jnp.ndarray:
    """a at column min(x+1, W-1) — edge-clamped shift along axis 1."""
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _shift_rows(a: jnp.ndarray) -> jnp.ndarray:
    """a at row min(y+1, H-1) — edge-clamped shift along axis 0."""
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _quad_warp(
    bilinear: jnp.ndarray,
    nearest: Optional[jnp.ndarray],
    yy: jnp.ndarray,
    xx: jnp.ndarray,
):
    """Warp ``bilinear`` (H, W, C) + optional ``nearest`` (H, W) in ONE gather.

    The four bilinear corner values of every pixel are pre-packed into a
    (H*W, 4*C') array via edge-clamped shifts (dense, cheap), so the warp is
    a single flat ``take`` of 4*C'-wide rows instead of four narrow ones:
    measured 4.75x faster on TPU at 256² (402 -> 1909 ex/s, BASELINE.md
    round-2 augmentation study, second round) and exact to float round-off.
    The nearest-neighbor channel rides the same gather — its sample is
    always one of the same four corners, selected by the coordinate
    fractions with a parity-aware tie rule reproducing ``jnp.round``'s
    round-half-to-even on the absolute coordinate. Boundary handling: clamp
    (== map_coordinates mode="nearest")."""
    h, w = bilinear.shape[:2]
    yy = jnp.clip(yy, 0.0, h - 1.0)
    xx = jnp.clip(xx, 0.0, w - 1.0)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[..., None]
    fx = (xx - x0)[..., None]

    stacked = bilinear
    if nearest is not None:
        stacked = jnp.concatenate(
            [stacked, nearest.astype(jnp.float32)[..., None]], -1
        )
    s01 = _shift_cols(stacked)
    s10 = _shift_rows(stacked)
    s11 = _shift_rows(s01)
    quad = jnp.concatenate([stacked, s01, s10, s11], -1)
    c = stacked.shape[-1]
    g = jnp.take(quad.reshape(h * w, 4 * c), y0 * w + x0, axis=0)
    g = g.reshape(h, w, 4, c)
    c00, c01, c10, c11 = g[:, :, 0], g[:, :, 1], g[:, :, 2], g[:, :, 3]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy

    out_nn = None
    if nearest is not None:
        # round-half-even on y0+fy: at fy==0.5 round() picks the even
        # neighbor, i.e. y0 when y0 is even, y0+1 when odd.
        fy2, fx2 = fy[..., 0], fx[..., 0]
        sel_y = jnp.where(fy2 == 0.5, (y0 % 2) == 1, fy2 > 0.5)
        sel_x = jnp.where(fx2 == 0.5, (x0 % 2) == 1, fx2 > 0.5)
        nn_top = jnp.where(sel_x, c01[..., -1], c00[..., -1])
        nn_bot = jnp.where(sel_x, c11[..., -1], c10[..., -1])
        out_nn = jnp.where(sel_y, nn_bot, nn_top).astype(nearest.dtype)
        out = out[..., :-1]
    return out, out_nn


def _flat_nearest(arr: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor resample of ``arr`` (H, W, C) — one flat take."""
    h, w = arr.shape[:2]
    yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, w - 1)
    return jnp.take(arr.reshape(h * w, -1), yi * w + xi, axis=0)


def _warp_coords(shape, dy, dx):
    h, w = shape
    yy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None] + dy, (h, w))
    xx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :] + dx, (h, w))
    return yy, xx


def elastic_warp(
    img: jnp.ndarray,
    dy: jnp.ndarray,
    dx: jnp.ndarray,
    order: int = 1,
) -> jnp.ndarray:
    """Warp ``img`` (H, W[, C]) by the displacement field (bilinear or NN)."""
    yy, xx = _warp_coords(img.shape[:2], dy, dx)
    squeeze = img.ndim == 2
    arr = img[..., None] if squeeze else img
    out = _quad_warp(arr, None, yy, xx)[0] if order else _flat_nearest(arr, yy, xx)
    return out[..., 0] if squeeze else out


def _warp_example(image, labels, weights, dy, dx, dims: int):
    """Warp (image, labels, weights) by one field with ONE gather total.

    Image channels, the weight map AND the label plane share a single
    quad-corner gather (``_quad_warp``): bilinear channels combine all four
    corners, the label picks one of them nearest-neighbor-style. 3D volumes
    apply the SAME (dy, dx) field to every z-plane: microscopy deformation
    is dominantly lateral (xy); a z-consistent field keeps structures
    coherent across the stack (spec decision — the reference's 3D
    augmentation parameters are unavailable)."""

    def plane(img2, lab2, w2):
        yy, xx = _warp_coords(img2.shape[:2], dy, dx)
        squeeze = img2.ndim == 2  # channel-less images are accepted (H, W)
        if squeeze:
            img2 = img2[..., None]
        stacked = jnp.concatenate(
            [img2.astype(jnp.float32), w2.astype(jnp.float32)[..., None]], -1
        )
        warped, out_lab = _quad_warp(stacked, lab2, yy, xx)
        out_img = warped[..., :-1]
        if squeeze:
            out_img = out_img[..., 0]
        return out_img, out_lab, warped[..., -1]

    # vmap cannot carry None leaves: substitute dummies, drop them after
    # (labels/weights are always present on the training hot path)
    lab_in = (
        labels if labels is not None else jnp.zeros(image.shape[:dims], jnp.int32)
    )
    w_in = (
        weights if weights is not None else jnp.ones(image.shape[:dims], jnp.float32)
    )
    if dims == 2:
        out_img, out_lab, out_w = plane(image, lab_in, w_in)
    else:
        out_img, out_lab, out_w = jax.vmap(plane)(image, lab_in, w_in)
    return (
        out_img,
        out_lab if labels is not None else None,
        out_w if weights is not None else None,
    )


def augment_example(
    key: jax.Array,
    image: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    elastic_alpha: float = 20.0,
    elastic_grid: int = 4,
    p_elastic: float = 0.5,
    dims: int = 2,
    gain_jitter: float = 0.0,
    offset_jitter: float = 0.0,
    noise_std: float = 0.0,
):
    """Full sequitr-style augmentation of one (image, labels, weights) example.

    2D (``dims=2``): ``image`` (H, W, C) float, ``labels`` (H, W) int,
    ``weights`` (H, W). 3D (``dims=3``): ``image`` (Z, H, W, C), ``labels``/
    ``weights`` (Z, H, W); flips act on all three spatial axes, rotations and
    the elastic warp act in-plane (the same field on every z-slice). The
    same geometric transform is applied to image/labels/weights; ``None``
    passes through. Photometric jitter (``gain_jitter``/``offset_jitter``/
    ``noise_std``, default off) perturbs the IMAGE after the geometry —
    see ``photometric_jitter``.
    """
    photometric = gain_jitter > 0 or offset_jitter > 0 or noise_std > 0
    if photometric:
        # the extra split happens ONLY when photometry is on: with every
        # knob at its default the random streams — and therefore the
        # committed augmentation goldens — stay bit-identical
        k_flip, k_rot, k_el, k_p, k_phot = jax.random.split(key, 5)
    else:
        k_flip, k_rot, k_el, k_p = jax.random.split(key, 4)
    arrays = [image]
    if labels is not None:
        arrays.append(labels)
    if weights is not None:
        arrays.append(weights)

    flip_axes = (0, 1) if dims == 2 else (0, 1, 2)
    rot_axes = (0, 1) if dims == 2 else (1, 2)
    arrays = (
        list(random_flip(k_flip, *arrays, axes=flip_axes))
        if len(arrays) > 1
        else [random_flip(k_flip, arrays[0], axes=flip_axes)]
    )
    arrays = (
        list(random_rot90(k_rot, *arrays, axes=rot_axes))
        if len(arrays) > 1
        else [random_rot90(k_rot, arrays[0], axes=rot_axes)]
    )

    plane_shape = image.shape[:2] if dims == 2 else image.shape[1:3]
    dy, dx = elastic_fields(k_el, plane_shape, elastic_alpha, elastic_grid)
    do_el = jax.random.bernoulli(k_p, p_elastic)
    dy = jnp.where(do_el, dy, 0.0)
    dx = jnp.where(do_el, dx, 0.0)

    idx = 1
    lab_in = None
    w_in = None
    if labels is not None:
        lab_in = arrays[idx]
        idx += 1
    if weights is not None:
        w_in = arrays[idx]
    out_img, out_lab, out_w = _warp_example(
        arrays[0], lab_in, w_in, dy, dx, dims
    )
    if photometric:
        # AFTER the geometry: pre-warp pixel noise would be smoothed by
        # the bilinear resample, delivering less than the configured
        # noise_std and spatially correlating it (review finding)
        out_img = photometric_jitter(
            k_phot, out_img, gain_jitter, offset_jitter, noise_std
        )
    return out_img, out_lab, out_w
