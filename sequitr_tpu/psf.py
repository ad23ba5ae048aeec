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
  control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_sigma_from_na",
    "gaussian_psf_2d",
    "gaussian_psf_3d",
    "psf_convolve",
    "richardson_lucy",
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
