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


def _map_coordinates_2d(img: jnp.ndarray, coords_y, coords_x, order: int) -> jnp.ndarray:
    """Warp a (H, W) or (H, W, C) array by sampling at (coords_y, coords_x)."""
    if img.ndim == 2:
        return jax.scipy.ndimage.map_coordinates(
            img, [coords_y, coords_x], order=order, mode="nearest"
        )
    return jax.vmap(
        lambda plane: jax.scipy.ndimage.map_coordinates(
            plane, [coords_y, coords_x], order=order, mode="nearest"
        ),
        in_axes=-1,
        out_axes=-1,
    )(img)


def elastic_warp(
    img: jnp.ndarray,
    dy: jnp.ndarray,
    dx: jnp.ndarray,
    order: int = 1,
) -> jnp.ndarray:
    """Warp ``img`` (H, W[, C]) by the displacement field (bilinear or NN)."""
    h, w = img.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + dy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + dx
    yy = jnp.broadcast_to(yy, (h, w))
    xx = jnp.broadcast_to(xx, (h, w))
    return _map_coordinates_2d(img, yy, xx, order)


def _elastic_warp_nd(arr: jnp.ndarray, dy, dx, order: int, dims: int) -> jnp.ndarray:
    """Warp a 2D (H, W[, C]) plane or 3D (Z, H, W[, C]) volume in-plane.

    3D volumes apply the SAME (dy, dx) field to every z-plane: microscopy
    deformation is dominantly lateral (xy); a z-consistent field keeps
    structures coherent across the stack (spec decision — the reference's
    3D augmentation parameters are unavailable)."""
    if dims == 2:
        return elastic_warp(arr, dy, dx, order)
    return jax.vmap(lambda plane: elastic_warp(plane, dy, dx, order))(arr)


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

    out_image = _elastic_warp_nd(arrays[0], dy, dx, order=1, dims=dims)
    idx = 1
    out_labels = None
    out_weights = None
    if labels is not None:
        out_labels = _elastic_warp_nd(
            arrays[idx].astype(jnp.float32), dy, dx, order=0, dims=dims
        ).astype(labels.dtype)
        idx += 1
    if weights is not None:
        out_weights = _elastic_warp_nd(
            arrays[idx].astype(jnp.float32), dy, dx, order=1, dims=dims
        )
    return out_image, out_labels, out_weights
