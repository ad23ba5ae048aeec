"""Per-frame acquisition QC: focus, exposure and saturation metrics.

The triage step before any model runs: microscopy timelapses routinely
carry out-of-focus frames (autofocus hunting), saturated frames (laser
spikes) and dark frames (shutter glitches, stage moves) that poison
training sets and corrupt downstream quantification. The reference era
caught these by eye; this module scores every frame on device — one
fused jit graph per frame shape computing all metrics in a single pass
over the pixels — and flags outliers host-side with robust statistics
over the whole run.

Metrics (``frame_qc``):

* ``focus_vol`` — variance of the 3x3 Laplacian response, the classic
  focus measure (defocus suppresses high frequencies, collapsing the
  Laplacian's variance). Comparable ACROSS a run, not across scenes.
* ``tenengrad`` — mean squared Sobel gradient magnitude; a second,
  differently-weighted focus measure (kernels emphasize different
  frequency bands, so disagreement itself is informative).
* ``mean`` / ``std`` / ``p01`` / ``p99`` — exposure statistics.
* ``sat_frac`` — fraction of pixels at or above the saturation level.

Flagging (``flag_frames``) is deliberately RELATIVE: a run's own median
+ MAD define "normal", so the thresholds need no per-microscope tuning —
``focus`` flags frames whose focus score falls ``mad_k`` robust sigmas
below the run median, ``dark`` flags means below ``dark_fraction`` of
the run median, ``saturated`` flags absolute saturation fractions.

Exposed through the job API as the ``qc_stack`` pipeline.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

__all__ = ["make_frame_qc", "cached_frame_qc", "flag_frames"]

# metric column order (the qc.csv contract; flag_frames indexes by name)
METRICS = ("focus_vol", "tenengrad", "mean", "std", "p01", "p99",
           "sat_frac")


def make_frame_qc():
    """Build ``qc(frame, sat_level) -> (7,) float32`` (any 2D shape).

    One fused graph: Laplacian + Sobel responses (valid-region only — a
    1-px rim is excluded so border padding can't fake sharpness),
    percentiles, moments and the saturation count. ``sat_level`` is a
    TRACED scalar so one compiled graph serves any dtype's full-scale
    value (pass ``jnp.inf`` to disable — sat_frac reads 0). jit itself
    specializes per frame shape, so the builder takes no shape.
    """
    import jax
    import jax.numpy as jnp

    def qc(frame, sat_level):
        x = frame.astype(jnp.float32)
        # interior views: shifts compose into 3x3 stencils without conv
        # machinery (the frame is one image — conv dispatch would win
        # nothing, and slices fuse into the same pass)
        c = x[1:-1, 1:-1]
        up, dn = x[:-2, 1:-1], x[2:, 1:-1]
        lf, rt = x[1:-1, :-2], x[1:-1, 2:]
        ul, ur = x[:-2, :-2], x[:-2, 2:]
        dl, dr = x[2:, :-2], x[2:, 2:]
        lap = up + dn + lf + rt - 4.0 * c
        focus_vol = jnp.var(lap)
        gx = (ur + 2.0 * rt + dr) - (ul + 2.0 * lf + dl)
        gy = (dl + 2.0 * dn + dr) - (ul + 2.0 * up + ur)
        tenengrad = jnp.mean(gx * gx + gy * gy)
        p01, p99 = jnp.percentile(x, jnp.asarray([1.0, 99.0]))
        sat = jnp.mean((x >= sat_level).astype(jnp.float32))
        return jnp.stack([
            focus_vol, tenengrad, jnp.mean(x), jnp.std(x), p01, p99, sat,
        ])

    return jax.jit(qc)


@functools.lru_cache(maxsize=1)
def cached_frame_qc():
    """The process-wide jitted QC entry point (cross-job reuse; jax's
    own per-shape retrace cache does the shape keying)."""
    return make_frame_qc()


@functools.lru_cache(maxsize=1)
def cached_volume_qc():
    """Volumetric twin: ``qc(volume, sat_level) -> (Z, 7)`` — the frame
    graph vmapped over z, one dispatch per volume. Cached at module
    level so a warm worker's repeated dims-3 jobs reuse one compiled
    graph (a per-job jit(lambda) would re-trace every time)."""
    import jax

    qc = cached_frame_qc()
    return jax.jit(lambda vol, sat: jax.vmap(lambda pl: qc(pl, sat))(vol))


def flag_frames(
    table: np.ndarray,
    mad_k: float = 3.5,
    dark_fraction: float = 0.5,
    sat_max: float = 0.01,
    focus_drop: float = 0.5,
) -> List[List[str]]:
    """Robust per-frame flags from a (T, 7) metric table.

    ``focus``: focus_vol more than ``mad_k`` robust sigmas (1.4826·MAD)
    below the run median AND below ``focus_drop`` x the median — the MAD
    term adapts to any scene/optics, the drop floor keeps tight
    low-variance runs from flagging 3%-dips (true defocus collapses the
    Laplacian variance by far more than half). ``dark``: mean below
    ``dark_fraction`` x the run's median mean. ``saturated``: sat_frac
    above ``sat_max`` (absolute — saturation is absolute). Single-frame
    runs never flag ``focus`` (no distribution).
    """
    t = np.asarray(table, np.float64)
    if t.ndim != 2 or t.shape[1] != len(METRICS):
        raise ValueError(
            f"table must be (T, {len(METRICS)}), got {t.shape}"
        )
    col = {m: t[:, i] for i, m in enumerate(METRICS)}
    flags: List[List[str]] = [[] for _ in range(len(t))]
    if len(t) > 1:
        med = float(np.median(col["focus_vol"]))
        mad = float(np.median(np.abs(col["focus_vol"] - med)))
        # MAD floor: >=50% identical focus scores (frozen stage,
        # duplicated frames) collapse the MAD to 0 — the degenerate run
        # must still flag a grossly defocused frame (the drop floor
        # prevents false positives), same guard as _robust_threshold
        sigma = max(1.4826 * mad, 1e-12)
        for i in np.flatnonzero(
            (col["focus_vol"] < med - mad_k * sigma)
            & (col["focus_vol"] < focus_drop * med)
        ):
            flags[i].append("focus")
    med_mean = float(np.median(col["mean"]))
    for i in np.flatnonzero(col["mean"] < dark_fraction * med_mean):
        flags[i].append("dark")
    for i in np.flatnonzero(col["sat_frac"] > sat_max):
        flags[i].append("saturated")
    return flags


def default_saturation_level(dtype: np.dtype) -> Optional[float]:
    """Full-scale value for integer camera data; None for float inputs
    (already-normalized floats have no natural ceiling — callers pass an
    explicit ``saturation_level`` instead)."""
    dtype = np.dtype(dtype)
    if dtype.kind in "ui":
        return float(np.iinfo(dtype).max)
    return None
