"""Z-projection: collapse z-stacks into 2D frames on device.

The bridge from volumetric acquisitions to the whole 2D pipeline family:
most confocal/light-sheet workflows project each timepoint's z-stack to
a single frame (ImageJ's "Z Project..." is the canonical tool) and run
segmentation/denoising/tracking on the projection. The reference era did
this host-side in ImageJ before submitting jobs; here it is a pipeline
(``project_stack``) so the projection chains straight into the 2D
families via ``depends_on`` — and the hot methods run as one fused jit
graph per volume on the chip.

Methods:

* ``max`` / ``min`` / ``sum`` / ``mean`` / ``std`` / ``median`` — plain
  reductions over z. ``max`` (maximum-intensity projection) is the
  fluorescence standard; ``min`` suits brightfield/absorbance.
* ``best_focus`` — whole-plane focus ranking (variance of the 3x3
  Laplacian, the same measure ``qc_stack`` uses) picks the single
  sharpest plane per volume, pixels unchanged. The chosen z is a
  by-product (the focal-drift signal).
* ``edof`` — extended depth of field: per-PIXEL focus selection. Local
  Laplacian energy per plane (box-smoothed over ``radius``) scores how
  in-focus each pixel is in each plane; the output takes each pixel
  from its sharpest plane — ``mode="blend"`` power-weights across z
  (smooth, seam-free; ``gamma`` sharpens the weighting), ``mode=
  "select"`` hard-gathers the argmax plane. The per-pixel argmax-z
  height map is a free by-product (surface topography).

Dtype contract: selection methods (``max``/``min``/``best_focus``)
return the input dtype bit-exactly; arithmetic methods (``mean``/
``sum``/``std``/``median``/``edof``) compute and return float32
(integer medians of even-length stacks are half-integral, sums
overflow narrow integer types).

TPU notes: every method is one jit dispatch per volume — reductions and
the EDoF stencil/box-filter/blend all fuse into a single pass over the
volume (the box filter is a ``lax.reduce_window`` sum, which Mosaic
lowers to vectorized windowed adds; no gather is needed in blend mode).
Volumes stream through ``pipeline.infer.stream_frames`` so the next
timepoint's H2D copy overlaps the current projection.
"""

from __future__ import annotations

import functools

__all__ = ["METHODS", "make_projector", "cached_projector"]

# methods -> True when the output preserves the input dtype bit-exactly
METHODS = {
    "max": True,
    "min": True,
    "sum": False,
    "mean": False,
    "std": False,
    "median": False,
    "best_focus": True,
    "edof": False,
}


def _plane_laplacian(x):
    """3x3 Laplacian over each plane of a (Z, Y, X) f32 volume, same
    shape (edge-replicated pad, so border pixels score from real
    neighbors instead of a zero rim that would fake an edge)."""
    import jax.numpy as jnp

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return (
        xp[:, :-2, 1:-1] + xp[:, 2:, 1:-1]
        + xp[:, 1:-1, :-2] + xp[:, 1:-1, 2:]
        - 4.0 * x
    )


def make_projector(
    method: str,
    radius: int = 4,
    gamma: float = 4.0,
    mode: str = "blend",
):
    """Build ``project(vol) -> (proj, aux)`` for (Z, Y, X) volumes, jitted.

    ``aux`` is method-specific: ``best_focus`` returns the chosen plane
    index (int32 scalar), ``edof`` the per-pixel argmax-z height map
    (int32, (Y, X)); every other method returns an int32 ``-1`` sentinel
    (a uniform pytree keeps one streaming loop in the server).

    ``radius``/``gamma``/``mode`` apply to ``edof`` only: the box
    half-width of the local sharpness window, the weighting exponent
    (higher = closer to hard selection) and ``"blend"``/``"select"``.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if method not in METHODS:
        raise ValueError(
            f"method={method!r} must be one of {sorted(METHODS)}"
        )
    radius = int(radius)
    if radius < 0:
        raise ValueError(f"radius={radius} must be >= 0")
    gamma = float(gamma)
    if not gamma > 0:
        raise ValueError(f"gamma={gamma} must be > 0")
    if mode not in ("blend", "select"):
        raise ValueError(f"mode={mode!r} must be 'blend' or 'select'")

    no_aux = -1  # int32 sentinel for methods without per-volume metadata

    def project(vol):
        if vol.ndim != 3:
            raise ValueError(f"volume must be (Z, Y, X), got {vol.shape}")
        aux = jnp.asarray(no_aux, jnp.int32)
        if method == "max":
            return jnp.max(vol, axis=0), aux
        if method == "min":
            return jnp.min(vol, axis=0), aux
        x = vol.astype(jnp.float32)
        if method == "sum":
            return jnp.sum(x, axis=0), aux
        if method == "mean":
            return jnp.mean(x, axis=0), aux
        if method == "std":
            return jnp.std(x, axis=0), aux
        if method == "median":
            return jnp.median(x, axis=0), aux
        if method == "best_focus":
            lap = _plane_laplacian(x)
            focus = jnp.var(lap, axis=(1, 2))
            z = jnp.argmax(focus)
            return vol[z], z.astype(jnp.int32)
        # edof: local Laplacian energy -> per-pixel cross-z weighting
        lap = _plane_laplacian(x)
        sharp = lap * lap
        if radius > 0:
            w = 2 * radius + 1
            # windowed SUM with SAME padding: truncated border windows
            # shrink identically across z at the same pixel, so the
            # cross-z ranking (all that matters) is unaffected
            sharp = lax.reduce_window(
                sharp, 0.0, lax.add, (1, w, w), (1, 1, 1), "SAME"
            )
        height = jnp.argmax(sharp, axis=0).astype(jnp.int32)
        if mode == "select":
            proj = jnp.take_along_axis(x, height[None], axis=0)[0]
            return proj, height
        # blend: scale-invariant power weights (normalize by the
        # per-pixel max first so gamma powers stay in f32 range
        # whatever the intensity scale)
        peak = jnp.max(sharp, axis=0, keepdims=True)
        wgt = (sharp / jnp.maximum(peak, 1e-30)) ** gamma
        denom = jnp.sum(wgt, axis=0)
        # a pixel that is perfectly flat in EVERY plane has zero
        # sharpness everywhere -> uniform weights (plain mean), not 0/0
        safe = denom > 0
        proj = jnp.where(
            safe,
            jnp.sum(wgt * x, axis=0) / jnp.where(safe, denom, 1.0),
            jnp.mean(x, axis=0),
        )
        return proj, height

    return jax.jit(project)


@functools.lru_cache(maxsize=8)
def cached_projector(
    method: str, radius: int = 4, gamma: float = 4.0, mode: str = "blend"
):
    """Process-wide cache of jitted projectors (cross-job reuse; jax's
    per-shape retrace cache does the shape keying). Keyed on the exact
    primitive params so distinct EDoF settings coexist."""
    return make_projector(method, radius=radius, gamma=gamma, mode=mode)
