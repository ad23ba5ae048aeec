"""Drift correction: FFT phase-correlation stack registration.

Timelapse microscopy stacks drift (stage creep, thermal expansion); every
downstream consumer — tracking (`sequitr_tpu.tracking`, btrack), per-pixel
QC, training-pair construction — assumes a stationary field of view. The
reference delegates registration to the surrounding Fiji/ImageJ tooling
(no registration code exists in scope; SURVEY.md §2 — this module is an
extension, documented as such in COMPONENTS.md), so the semantics here are
the standard phase-correlation estimator (Kuglin & Hines 1975) with
parabolic sub-pixel refinement.

TPU-first design notes
----------------------
* The whole per-frame step — FFT, cross-power spectrum, correlation
  surface, argmax + 3-point parabolic sub-pixel fit, Fourier-shift
  resample — is ONE jitted graph (`register_step`). 2D FFTs lower to
  batched matmuls on TPU (DFT-as-GEMM under XLA), so the hot work rides
  the MXU; everything else is elementwise and fuses.
* Streaming a stack costs two forward FFTs per frame (the windowed
  spectrum for correlation, the raw spectrum for the resample — the raw
  one also drives the refinement passes below) plus one inverse FFT each
  for the correlation surface and the resample; the sub-pixel resample
  itself is just a phase ramp on the already-computed raw spectrum (the
  Fourier shift theorem). Callers that do not need the fused resample
  (two-pass crop estimation, multi-channel trajectories) pass
  ``resample=False`` and skip its inverse FFT.
* No data-dependent Python control flow: the peak search is
  `argmax` + gathers with wrapped neighbor indexing, and the sub-pixel
  parabola is branchless (`jnp.where` guards), so the step compiles once
  per frame shape and is reused for the whole stack.
* The Hann window biases the estimate in proportion to the shift
  magnitude (the window modulates the two frames' shared content
  differently once it is displaced). ``refine`` re-correlates after
  shifting the moving frame back by the running estimate — at near-zero
  residual the window bias vanishes. Measured on band-limited scenes
  (96², sigma 0.08): max error 0.13 px at a 10 px shift single-pass →
  0.013 px with ``refine=2`` → 0.0013 px with ``refine=3``. Each extra
  pass costs three FFTs and is unrolled statically inside the same jit
  graph (no data-dependent iteration count).
* Estimation runs in float32/complex64 (drift magnitudes are tens of
  pixels; bf16's ~3 decimal digits would cost sub-pixel accuracy for no
  meaningful speed win — the FFTs are small).

The estimator is N-dimensional: (H, W) frames give (dy, dx), (Z, H, W)
volumes give (dz, dy, dx) — volumetric drift correction covers axial
focus creep, which no per-plane 2D registration can see. All design
notes above hold unchanged (fftn is separable, so the DFT-as-GEMM
lowering and the cost model scale per axis).

Conventions
-----------
``phase_correlate(ref, mov)`` returns ``(dy, dx)`` such that
``apply_shift(mov, (dy, dx)) ≈ ref``: the shift that moves the moving
frame back onto the reference. Shifts are reported in pixels, positive =
content moves down/right. ``apply_shift`` resamples via the Fourier
shift theorem, which is exact for band-limited content and WRAPS at the
frame edges (a frame drifting right re-enters on the left); integer-mode
registration (`subpixel=False`) uses `jnp.roll` (also wrapping, exact).
Callers that cannot tolerate wrapped borders crop to the common field of
view afterwards (`common_crop` computes the slab).

Phase correlation is mod-N ambiguous: a true displacement ``d`` and
``d - N`` produce identical spectra, and estimates are reported in the
canonical interval (-N/2, N/2]. For the WRAPPING resample this is
irrelevant (a ramp by ``d`` and ``d ± N`` are the same operator), but a
trajectory consumer (``common_crop``, shifts.csv) needs the unwrapped
physical drift. Drift is continuous in time, so `unwrap_trajectory`
recovers it exactly like phase unwrapping — as long as no SINGLE
estimate's true value exceeds N/2 (frame-to-frame motion beyond half a
frame is unrecoverable by any correlation method).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "hann2d",
    "phase_correlate",
    "apply_shift",
    "register_step",
    "register_batch",
    "unwrap_trajectory",
    "common_crop",
]


def hann_window(shape: Tuple[int, ...]) -> jnp.ndarray:
    """Separable N-D Hann window: damps spectral leakage from the
    non-periodic frame/volume borders before the correlation FFT."""
    out = None
    nd = len(shape)
    for ax, n in enumerate(shape):
        w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)
        w = w.reshape([-1 if i == ax else 1 for i in range(nd)])
        out = w if out is None else out * w
    return out


def hann2d(shape: Tuple[int, int]) -> jnp.ndarray:
    """2D alias of ``hann_window`` (the original public name)."""
    return hann_window(shape)


def _wrap_to_signed(p: jnp.ndarray, n: int) -> jnp.ndarray:
    """Map a peak index in [0, n) to the signed shift in (-n/2, n/2]."""
    return jnp.where(p > n // 2, p - n, p)


def _parabolic_offset(cm: jnp.ndarray, c0: jnp.ndarray, cp: jnp.ndarray):
    """3-point parabola vertex offset in [-0.5, 0.5] (branchless).

    Guards the degenerate flat case (denominator ~ 0 => offset 0) so a
    constant correlation surface — e.g. two identical blank frames —
    yields shift 0 instead of NaN.
    """
    denom = cm - 2.0 * c0 + cp
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


def _correlation_peak(surface: jnp.ndarray, subpixel: bool):
    """Peak location of an N-D correlation surface as a signed per-axis
    shift vector, plus the peak-sharpness response.

    The response is the peak-to-sidelobe ratio (peak minus surface mean,
    in surface standard deviations) — scale-invariant, so it stays a
    usable confidence number under the whitening regularizer (raw peak
    height shrinks with the fraction of informative frequencies). On real
    content a correct lock measures >~10; unrelated frames ~5.
    """
    dims = surface.shape
    idx = jnp.unravel_index(jnp.argmax(surface), dims)
    peak = surface[idx]
    comps = []
    for ax, n in enumerate(dims):
        if subpixel:
            lo = tuple(
                (idx[i] - 1) % n if i == ax else idx[i]
                for i in range(len(dims))
            )
            hi = tuple(
                (idx[i] + 1) % n if i == ax else idx[i]
                for i in range(len(dims))
            )
            off = _parabolic_offset(surface[lo], peak, surface[hi])
        else:
            off = jnp.zeros(())
        comps.append(_wrap_to_signed(idx[ax], n).astype(jnp.float32) + off)
    resp = (peak - surface.mean()) / jnp.maximum(surface.std(), 1e-30)
    return jnp.stack(comps), resp


def _cross_power_surface(ref_fft: jnp.ndarray, mov_fft: jnp.ndarray):
    """Inverse FFT of the normalized cross-power spectrum.

    Phase correlation proper: whitening (dividing out the magnitude)
    makes the peak a delta at the displacement regardless of the image's
    own spectrum, which is what makes the estimator robust to intensity
    changes (photobleaching) between frames. The regularizer is RELATIVE
    to the spectrum's scale: frequencies carrying ~zero energy (numerical
    noise in smooth images) must not contribute their garbage phases at
    full weight, which a tiny absolute epsilon would allow.
    """
    r = ref_fft * jnp.conj(mov_fft)
    mag = jnp.abs(r)
    r = r / (mag + 1e-4 * jnp.mean(mag) + 1e-30)
    return jnp.fft.ifftn(r).real


def _refined_peak(
    ref_fft_win: jnp.ndarray,
    mov_fft_win: jnp.ndarray,
    mov_fft_raw: jnp.ndarray,
    win: jnp.ndarray,
    subpixel: bool,
    refine: int,
):
    """Correlation peak with window-debiasing refinement passes.

    Pass 1 correlates the windowed spectra directly. Each further pass
    translates the moving frame back by the running estimate (phase ramp
    on its RAW spectrum — exact), re-windows in space, and correlates
    the residual; the window bias is proportional to the residual shift,
    so it collapses geometrically (module docstring has the numbers).
    The loop is unrolled at trace time (``refine`` is static).
    """
    surface = _cross_power_surface(ref_fft_win, mov_fft_win)
    total, resp = _correlation_peak(surface, subpixel)
    for _ in range(max(0, refine - 1)):
        shifted = jnp.fft.ifftn(
            mov_fft_raw * _shift_ramp(mov_fft_raw.shape, total)
        ).real
        surface = _cross_power_surface(ref_fft_win, jnp.fft.fftn(shifted * win))
        step, resp = _correlation_peak(surface, subpixel)
        total = total + step
    return total, resp


@partial(jax.jit, static_argnames=("subpixel", "window", "refine"))
def phase_correlate(
    ref: jnp.ndarray,
    mov: jnp.ndarray,
    *,
    subpixel: bool = True,
    window: bool = True,
    refine: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translation of ``mov`` relative to ``ref`` by phase correlation.

    N-dimensional: (H, W) frames give a 2-vector, (Z, H, W) volumes a
    3-vector (volumetric drift incl. axial focus creep), one component
    per axis. Returns ``(shift, response)``: ``shift`` float32 such that
    ``apply_shift(mov, shift) ≈ ref``; ``response`` is the correlation
    peak-to-sidelobe ratio (see ``_correlation_peak``) — low values flag
    unreliable estimates (blank frames, focus jumps, unrelated content).
    ``refine`` is the number of correlation passes (window-debiasing
    refinement; see ``_refined_peak``).
    """
    ref = ref.astype(jnp.float32)
    mov = mov.astype(jnp.float32)
    win = (
        hann_window(ref.shape) if window else jnp.ones(ref.shape, jnp.float32)
    )
    mov_fft_raw = jnp.fft.fftn(mov)
    # mov(x) = ref(x - d)  =>  surface peaks at x ≡ -d, and the aligning
    # shift (apply_shift(mov, s) = ref) is s = -d: the peak itself.
    return _refined_peak(
        jnp.fft.fftn(ref * win),
        jnp.fft.fftn(mov * win),
        mov_fft_raw,
        win,
        subpixel,
        refine,
    )


def _shift_ramp(shape: Tuple[int, ...], shift: jnp.ndarray) -> jnp.ndarray:
    """Phase ramp implementing out(x) = in(x - shift) in the frequency
    domain (the Fourier shift theorem), any rank."""
    phase = None
    nd = len(shape)
    for ax, n in enumerate(shape):
        f = jnp.fft.fftfreq(n).reshape(
            [-1 if i == ax else 1 for i in range(nd)]
        )
        term = f * shift[ax]
        phase = term if phase is None else phase + term
    return jnp.exp(-2j * jnp.pi * phase)


@jax.jit
def apply_shift(frame: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Translate an N-D ``frame`` by a (possibly sub-pixel) per-axis
    shift vector ((dy, dx) for frames, (dz, dy, dx) for volumes).

    Exact sinc interpolation via the Fourier shift theorem; content wraps
    at the borders (see module docstring). Output is float32.
    """
    f = jnp.fft.fftn(frame.astype(jnp.float32))
    shift = jnp.asarray(shift, jnp.float32)
    return jnp.fft.ifftn(f * _shift_ramp(frame.shape, shift)).real


@partial(
    jax.jit, static_argnames=("subpixel", "window", "refine", "resample")
)
def register_step(
    anchor_fft: jnp.ndarray,
    frame: jnp.ndarray,
    cum_shift: jnp.ndarray,
    *,
    subpixel: bool = True,
    window: bool = True,
    refine: int = 2,
    resample: bool = True,
):
    """One fused streaming-registration step.

    Correlates ``frame`` against the anchor spectrum (previous frame for
    drift mode, first frame for reference mode) with ``refine``
    window-debiasing passes (see ``_refined_peak``), accumulates the
    trajectory, and resamples the frame by the cumulative shift — one
    jit graph, one dispatch per frame.

    Args:
      anchor_fft: windowed FFT of the anchor frame (from a previous step).
      frame: (H, W) new frame — or (Z, H, W) for volumetric registration.
      cum_shift: (ndim,) float32 cumulative shift of the ANCHOR frame.

    Returns ``(frame_fft_win, new_cum, corrected, step_shift, response)``
    where ``frame_fft_win`` is this frame's windowed spectrum (the next
    step's anchor in drift mode), ``new_cum = cum_shift + step_shift`` is
    the shift that moves this frame onto the stack's first frame, and
    ``corrected = apply_shift(frame, new_cum)`` (sub-pixel) — integer
    mode rolls instead, keeping pixel values bit-exact. Estimation-only
    callers (two-pass crop, multi-channel hosts that resample natively
    per channel) pass ``resample=False``; ``corrected`` is then ``None``
    and its inverse FFT never enters the graph.
    """
    f32 = frame.astype(jnp.float32)
    win = (
        hann_window(frame.shape)
        if window
        else jnp.ones(frame.shape, jnp.float32)
    )
    frame_fft_win = jnp.fft.fftn(f32 * win)
    raw_fft = jnp.fft.fftn(f32)
    # the peak is the aligning shift directly (see phase_correlate)
    step_shift, resp = _refined_peak(
        anchor_fft, frame_fft_win, raw_fft, win, subpixel, refine
    )
    new_cum = cum_shift + step_shift
    if not resample:
        corrected = None
    elif subpixel:
        corrected = jnp.fft.ifftn(
            raw_fft * _shift_ramp(frame.shape, new_cum)
        ).real
    else:
        r = jnp.round(new_cum).astype(jnp.int32)
        corrected = jnp.roll(
            f32,
            tuple(r[i] for i in range(f32.ndim)),
            axis=tuple(range(f32.ndim)),
        )
    return frame_fft_win, new_cum, corrected, step_shift, resp


def _register_batch_impl(
    ref: jnp.ndarray,
    frames: jnp.ndarray,
    subpixel: bool,
    window: bool,
    refine: int,
    resample: bool,
):
    """Full body of ``register_batch`` (unjitted so callers control the
    jit boundary — the DP wrapper re-jits it with mesh shardings).
    Owns the reference prep too, so the single-chip and DP paths cannot
    diverge in windowing/normalization."""
    ref = ref.astype(jnp.float32)
    win = (
        hann_window(ref.shape) if window else jnp.ones(ref.shape, jnp.float32)
    )
    ref_fft_win = jnp.fft.fftn(ref * win)

    def one(frame):
        f32 = frame.astype(jnp.float32)
        fft_w = jnp.fft.fftn(f32 * win)
        raw = jnp.fft.fftn(f32)
        shift, resp = _refined_peak(
            ref_fft_win, fft_w, raw, win, subpixel, refine
        )
        if not resample:
            corrected = jnp.zeros((), jnp.float32)  # uniform pytree leaf
        elif subpixel:
            corrected = jnp.fft.ifftn(
                raw * _shift_ramp(frame.shape, shift)
            ).real
        else:
            r = jnp.round(shift).astype(jnp.int32)
            corrected = jnp.roll(
                f32,
                tuple(r[i] for i in range(f32.ndim)),
                axis=tuple(range(f32.ndim)),
            )
        return shift, resp, corrected

    return jax.vmap(one)(frames)


@partial(
    jax.jit, static_argnames=("subpixel", "window", "refine", "resample")
)
def register_batch(
    ref: jnp.ndarray,
    frames: jnp.ndarray,
    *,
    subpixel: bool = True,
    window: bool = True,
    refine: int = 2,
    resample: bool = True,
):
    """First-frame-mode registration of a whole batch in ONE dispatch.

    In ``first`` mode every frame correlates against the SAME reference —
    there is no frame-to-frame dependency — so the estimate is
    embarrassingly parallel: ``frames`` is (B, H, W) (or (B, Z, H, W));
    returns ``(shifts, responses, corrected)`` with leading dim B. The
    body is a vmap, so a device mesh shards B over chips with zero
    inter-chip traffic (``parallel.mesh.make_dp_registerer`` supplies the
    sharded-jit form). ``resample=False`` returns a dummy scalar batch in
    the corrected slot and compiles the resample out.

    The streaming ``register_step`` remains the tool for ``previous``
    (drift-integration) mode, whose anchor chain is inherently serial.
    """
    return _register_batch_impl(
        ref, frames, subpixel, window, refine, resample
    )


def unwrap_trajectory(shifts: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Resolve the mod-N ambiguity of a per-frame shift trajectory.

    Each estimate is canonical in (-N/2, N/2]; when the true cumulative
    drift crosses that boundary (first-frame mode on a long drift), the
    reported value jumps by ~N between consecutive frames. Drift is
    continuous, so the physical trajectory is the one whose successive
    differences are minimal — exactly 1D phase unwrapping with period N
    per axis. No-op for trajectories that never wrap (previous-mode
    integration produces those by construction). Host-side: runs once
    per stack on a (T, ndim) array.
    """
    shifts = np.asarray(shifts, np.float64)
    out = shifts.copy()
    for ax, n in enumerate(shape):
        d = np.diff(shifts[:, ax])
        corr = np.cumsum(np.round(d / n)) * n
        out[1:, ax] = shifts[1:, ax] - corr
    return out


def common_crop(shifts: np.ndarray, shape: Tuple[int, ...]):
    """Per-axis slices of the field of view every registered frame (or
    volume) actually covers.

    ``shifts``: (T, ndim) cumulative per-frame shifts as returned by the
    registration loop, UNWRAPPED (`unwrap_trajectory`) — a mod-N wrapped
    trajectory would select exactly the stale wrapped region instead of
    the valid one. A frame shifted down by +d only has valid content
    for rows >= d (the wrapped rows at the top are stale); the common
    region trims the max positive shift off the leading edge and the max
    negative shift off the trailing edge of each axis.
    """
    shifts = np.asarray(shifts, np.float64)
    # eps absorbs estimator noise: a 1e-6 px "shift" on the reference
    # frame must not ceil into discarding a whole valid row
    eps = 1e-3
    out = []
    for ax, n in enumerate(shape):
        lo = int(np.ceil(max(0.0, shifts[:, ax].max()) - eps))
        hi = n + int(np.floor(min(0.0, shifts[:, ax].min()) + eps))
        if lo >= hi:
            raise ValueError(
                f"drift exceeds the frame: shifts span "
                f"{shifts.min(0)}..{shifts.max(0)} for shape {shape}"
            )
        out.append(slice(lo, hi))
    return tuple(out)
