"""Point-spread-function utilities for fluorescence microscopy.

The reference README advertises PSF modelling for single-molecule imaging
(SURVEY.md §2 'PSF modelling' — peripheral, existence unconfirmed with the
mount empty; built here as a compact capability-parity module). Provides:

* ``gaussian_psf_2d`` / ``gaussian_psf_3d`` — Gaussian approximations to
  the widefield/confocal PSF (Zhang et al. 2007 parameterization of the
  Born–Wolf model: sigma from numerical aperture and wavelength);
* ``psf_convolve`` — FFT-domain convolution of an image stack with a PSF
  (jit-safe, runs on TPU via XLA's FFT);
* ``richardson_lucy`` — iterative deconvolution with a fixed iteration
  count (``lax.fori_loop`` — compiler-friendly, no data-dependent Python
  control flow);
* ``detect_peaks`` / ``fit_peaks_gaussian`` / ``localize_emitters`` —
  single-molecule sub-pixel localization: max-pool NMS + top_k candidate
  selection (static shapes) and vmapped Gaussian-mask centroid refinement
  (Thompson et al. 2002), the whole chain one jit graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_sigma_from_na",
    "gaussian_psf_2d",
    "gaussian_psf_3d",
    "psf_convolve",
    "richardson_lucy",
    "detect_peaks",
    "fit_peaks_gaussian",
    "localize_emitters",
]


def gaussian_sigma_from_na(
    wavelength_nm: float, na: float, pixel_size_nm: float
) -> float:
    """Lateral Gaussian sigma (pixels) approximating a widefield PSF.

    Zhang, Zerubia & Olivo-Marin (2007): sigma ~ 0.21 * lambda / NA for a
    paraxial widefield PSF, converted to pixel units.
    """
    return 0.21 * wavelength_nm / na / pixel_size_nm


def gaussian_psf_2d(size: int, sigma: float) -> jnp.ndarray:
    """(size, size) normalized Gaussian kernel."""
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r**2) / (2.0 * sigma**2))
    k = jnp.outer(g, g)
    return k / jnp.sum(k)


def gaussian_psf_3d(size_xy: int, size_z: int, sigma_xy: float, sigma_z: float) -> jnp.ndarray:
    """(size_z, size_xy, size_xy) normalized anisotropic Gaussian kernel."""
    rz = jnp.arange(size_z, dtype=jnp.float32) - (size_z - 1) / 2.0
    gz = jnp.exp(-(rz**2) / (2.0 * sigma_z**2))
    k2 = gaussian_psf_2d(size_xy, sigma_xy)
    k = gz[:, None, None] * k2[None]
    return k / jnp.sum(k)


def _fft_shape(image_shape, psf_shape):
    return tuple(int(s) for s in image_shape)


def psf_convolve(image: jnp.ndarray, psf: jnp.ndarray) -> jnp.ndarray:
    """Circular FFT convolution of ``image`` with a centered ``psf``.

    Shapes: image (*spatial,), psf (*kernel,) with kernel <= spatial.
    The PSF is zero-padded and ifftshifted so its center sits at the origin.
    """
    shape = image.shape
    pad = [(0, s - k) for s, k in zip(shape, psf.shape)]
    psf_pad = jnp.pad(psf.astype(jnp.float32), pad)
    shift = [-(k // 2) for k in psf.shape]
    psf_pad = jnp.roll(psf_pad, shift, axis=tuple(range(psf.ndim)))
    out = jnp.fft.irfftn(
        jnp.fft.rfftn(image.astype(jnp.float32)) * jnp.fft.rfftn(psf_pad),
        s=shape,
    )
    return out


def richardson_lucy(
    image: jnp.ndarray, psf: jnp.ndarray, iterations: int = 20, eps: float = 1e-6
) -> jnp.ndarray:
    """Richardson–Lucy deconvolution with a static iteration count."""
    image = jnp.maximum(image.astype(jnp.float32), 0.0)
    psf_mirror = jnp.flip(psf)

    def body(_, est):
        conv = psf_convolve(est, psf)
        ratio = image / jnp.maximum(conv, eps)
        return est * psf_convolve(ratio, psf_mirror)

    est0 = jnp.full_like(image, jnp.mean(image) + eps)
    return jax.lax.fori_loop(0, iterations, body, est0)


# ---------------------------------------------------------------------------
# single-molecule sub-pixel localization
# ---------------------------------------------------------------------------


def detect_peaks(
    image: jnp.ndarray,
    threshold: float,
    max_peaks: int = 256,
    min_distance: int = 2,
):
    """Candidate emitter pixels: local maxima above ``threshold``.

    TPU-first formulation: non-maximum suppression is a max-pool compare
    (reduce_window) and candidate selection is one ``top_k`` — fixed output
    shape (``max_peaks``), no data-dependent shapes, fully jit-safe.

    Returns ``(yx, valid)``: (max_peaks, 2) int32 pixel coordinates and a
    boolean mask (False rows are padding below threshold).
    """
    img = image.astype(jnp.float32)
    k = 2 * min_distance + 1
    pooled = jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    is_peak = (img == pooled) & (img > threshold)
    score = jnp.where(is_peak, img, -jnp.inf).reshape(-1)
    max_peaks = min(max_peaks, score.size)  # top_k requires k <= size
    vals, idx = jax.lax.top_k(score, max_peaks)
    yx = jnp.stack([idx // img.shape[1], idx % img.shape[1]], axis=-1)
    return yx.astype(jnp.int32), jnp.isfinite(vals)


def fit_peaks_gaussian(
    image: jnp.ndarray,
    yx: jnp.ndarray,
    window: int = 7,
    sigma: float = 1.5,
    iterations: int = 8,
):
    """Sub-pixel emitter positions via iterative Gaussian-mask centroids.

    Thompson, Larson & Webb (Biophys J 2002): iterate a Gaussian-weighted,
    background-subtracted centroid inside a ``window``x``window`` crop —
    converges to well under 0.1 px on Gaussian spots and needs no
    matrix solves, so it vmaps over all candidates as one fused graph on
    the VPU. Background = mean of the crop border.

    Returns dict with ``y``/``x`` (float sub-pixel, image coordinates),
    ``amplitude`` (background-subtracted peak mass under the mask) and
    ``background``.
    """
    img = image.astype(jnp.float32)
    h, w = img.shape
    half = window // 2
    rel = jnp.arange(window, dtype=jnp.float32)

    def fit_one(p):
        # clamp so the crop stays in bounds (static shape)
        y0 = jnp.clip(p[0] - half, 0, h - window)
        x0 = jnp.clip(p[1] - half, 0, w - window)
        crop = jax.lax.dynamic_slice(img, (y0, x0), (window, window))
        border = jnp.concatenate(
            [crop[0], crop[-1], crop[1:-1, 0], crop[1:-1, -1]]
        )
        bg = jnp.mean(border)
        signal = jnp.maximum(crop - bg, 0.0)
        yy = rel[:, None] + jnp.zeros_like(crop)
        xx = rel[None, :] + jnp.zeros_like(crop)

        def body(_, c):
            cy, cx = c
            wgt = jnp.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2.0 * sigma**2)
            )
            m = wgt * signal
            tot = jnp.maximum(jnp.sum(m), 1e-12)
            return jnp.sum(m * yy) / tot, jnp.sum(m * xx) / tot

        cy, cx = jax.lax.fori_loop(
            0, iterations, body, (jnp.float32(half), jnp.float32(half))
        )
        wgt = jnp.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2.0 * sigma**2))
        amp = jnp.sum(wgt * signal) / jnp.maximum(jnp.sum(wgt**2), 1e-12)
        return cy + y0, cx + x0, amp, bg

    ys, xs, amps, bgs = jax.vmap(fit_one)(yx)
    return {"y": ys, "x": xs, "amplitude": amps, "background": bgs}


def localize_emitters(
    image,
    threshold: float,
    max_peaks: int = 256,
    min_distance: int = 2,
    window: int = 7,
    sigma: float = 1.5,
):
    """Detect + sub-pixel-fit emitters in one jit graph; host-facing.

    Returns a dict of numpy arrays (y, x, amplitude, background) holding
    only the valid detections, sorted brightest-first (top_k order).
    The threshold is a TRACED argument of one module-level jitted graph,
    so stacks with per-frame (data-dependent) thresholds compile once and
    dispatch per frame — not one retrace+compile per frame.
    """
    import numpy as np

    _, valid, fits = _detect_and_fit(
        jnp.asarray(image), jnp.float32(threshold),
        max_peaks=max_peaks, min_distance=min_distance,
        window=window, sigma=sigma,
    )
    valid = np.asarray(valid)
    return {k: np.asarray(v)[valid] for k, v in fits.items()}


@functools.partial(
    jax.jit, static_argnames=("max_peaks", "min_distance", "window", "sigma")
)
def _detect_and_fit(img, threshold, *, max_peaks, min_distance, window, sigma):
    yx, valid = detect_peaks(img, threshold, max_peaks, min_distance)
    fits = fit_peaks_gaussian(img, yx, window=window, sigma=sigma)
    return yx, valid, fits
