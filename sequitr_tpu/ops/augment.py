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
  smoothed dense field) and warps with a bilinear ``map_coordinates``
  gather. Labels/weight-maps are warped with the same field; labels use
  nearest-neighbor sampling to stay integral.
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
    "augment_example",
]


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


def _flat_bilinear(arr: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resample of ``arr`` (H, W, C) at float coords (H, W).

    Formulated as four flat 1-D ``take``s on row-major indices instead of a
    2-axis coordinate gather (``map_coordinates``): measured 1.5x faster on
    TPU at 256² and exact to float round-off (BASELINE.md round-2
    augmentation study). Boundary handling: clamp (== map_coordinates
    mode="nearest")."""
    h, w = arr.shape[:2]
    yy = jnp.clip(yy, 0.0, h - 1.0)
    xx = jnp.clip(xx, 0.0, w - 1.0)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yy - y0)[..., None]
    fx = (xx - x0)[..., None]
    flat = arr.reshape(h * w, -1)

    def g(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
    return top * (1 - fy) + bot * fy


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
    out = _flat_bilinear(arr, yy, xx) if order else _flat_nearest(arr, yy, xx)
    return out[..., 0] if squeeze else out


def _warp_example(image, labels, weights, dy, dx, dims: int):
    """Warp (image, labels, weights) by one field with minimal gather work.

    Image channels and the weight map share ONE bilinear resample (the
    extra channel is nearly free — the four flat takes dominate, measured
    round 2); labels take a single nearest-neighbor gather. 3D volumes
    apply the SAME (dy, dx) field to every z-plane: microscopy deformation
    is dominantly lateral (xy); a z-consistent field keeps structures
    coherent across the stack (spec decision — the reference's 3D
    augmentation parameters are unavailable)."""

    def plane(img2, lab2, w2):
        yy, xx = _warp_coords(img2.shape[:2], dy, dx)
        stacked = jnp.concatenate(
            [img2.astype(jnp.float32), w2.astype(jnp.float32)[..., None]], -1
        )
        warped = _flat_bilinear(stacked, yy, xx)
        out_lab = _flat_nearest(lab2[..., None], yy, xx)[..., 0]
        return warped[..., :-1], out_lab, warped[..., -1]

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
):
    """Full sequitr-style augmentation of one (image, labels, weights) example.

    2D (``dims=2``): ``image`` (H, W, C) float, ``labels`` (H, W) int,
    ``weights`` (H, W). 3D (``dims=3``): ``image`` (Z, H, W, C), ``labels``/
    ``weights`` (Z, H, W); flips act on all three spatial axes, rotations and
    the elastic warp act in-plane (the same field on every z-slice). The
    same geometric transform is applied to image/labels/weights; ``None``
    passes through.
    """
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
    return _warp_example(arrays[0], lab_in, w_in, dy, dx, dims)
