"""Device mesh + data-parallel sharding (SPMD over ICI).

The reference is single-GPU with no distributed execution (SURVEY.md §2
'Parallelism strategies'); scaling here comes from the rebuild's north star:
batch-sharded data parallelism over a TPU mesh, with XLA inserting the
all-reduces over ICI (BASELINE.json; SURVEY.md §5 'Distributed comm
backend'). There are no attention layers and the models are small, so DP
over frames/patches is the load-bearing strategy; spatial sharding of very
large frames is provided as an extension (``sequitr_tpu.parallel.spatial``).

Design: ``jit`` with ``NamedSharding`` in/out shardings — parameters and
model state replicated, the batch axis sharded over the ``data`` mesh axis.
XLA turns the gradient mean into a single ICI all-reduce; no hand-written
collectives are needed for DP.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "make_dp_train_step",
    "make_dp_frame_inferrer",
    "make_dp_frame_mapper",
    "make_dp_registerer",
    "make_dp_localizer",
    "make_dp_localizer3d",
    "make_dp_localizer_astig",
    "make_dp_deconvolver",
    "make_dp_seam_correlator",
]


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh2d(
    shape: tuple,
    axis_names: tuple = ("data", "space"),
) -> Mesh:
    """2-D mesh, e.g. (2, 4) = 2-way data x 4-way spatial (hybrid serving)."""
    n = int(np.prod(shape))
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, only {len(devs)} available"
        )
    return Mesh(np.asarray(devs[:n]).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place a host batch pytree with its leading axis sharded over the mesh."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_dp_train_step(
    train_step: Callable, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Wrap a single-chip ``step(state, batch, key)`` for data parallelism.

    State (params/opt/BN stats) is replicated; every leaf of ``batch`` is
    sharded on its leading axis. The per-batch mean in the loss makes XLA
    emit one gradient all-reduce over ICI — the canonical DP pattern.
    """
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis_name)
    cache: dict = {}

    def wrapped(state, batch, key):
        struct = jax.tree.structure(batch)
        if struct not in cache:
            cache[struct] = jax.jit(
                train_step,
                in_shardings=(rep, jax.tree.map(lambda _: shd, batch), rep),
                out_shardings=(rep, rep),
                donate_argnums=0,
            )
        return cache[struct](state, batch, key)

    return wrapped


def make_dp_frame_inferrer(
    infer_fn: Callable, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Vectorize a per-frame inferrer over a frame batch sharded on the mesh.

    ``infer_fn(params, state, frame) -> (probs, labels)`` (un-jitted single
    frame chain) becomes ``batched(params, state, frames)`` with ``frames``
    (D, *spatial[, C]) sharded over ``data`` — each chip runs the full fused
    normalize->tile->net->stitch graph on its shard of frames with zero
    inter-chip traffic (embarrassingly parallel; SURVEY.md §3.3).
    """
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis_name)
    return jax.jit(
        lambda params, state, frames: jax.vmap(
            lambda f: infer_fn(params, state, f)
        )(frames),
        in_shardings=(rep, rep, shd),
        out_shardings=(shd, shd),
    )


def make_dp_frame_mapper(
    fn: Callable, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """DP form of a SINGLE-output per-frame function.

    Same pattern as ``make_dp_frame_inferrer`` but for functions returning
    one array — e.g. the GAN enhancement pass
    (``infer.make_gan_enhancer``): frames (D, *spatial[, C]) sharded over
    ``data``, output (D, ...) sharded, weights replicated, zero inter-chip
    traffic.
    """
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis_name)
    return jax.jit(
        lambda params, state, frames: jax.vmap(
            lambda f: fn(params, state, f)
        )(frames),
        in_shardings=(rep, rep, shd),
        out_shardings=shd,
    )


def make_dp_registerer(
    mesh: Mesh,
    *,
    subpixel: bool = True,
    window: bool = True,
    refine: int = 2,
    resample: bool = True,
    axis_name: str = "data",
) -> Callable:
    """DP form of first-frame-mode drift registration.

    ``registered(ref, frames)`` with ``ref`` (H, W) (or (Z, H, W))
    replicated and ``frames`` (D, *spatial) sharded over ``data``: every
    chip estimates + resamples its shard of frames against the shared
    reference in one dispatch with zero inter-chip traffic (the estimate
    is embarrassingly parallel in ``first`` mode — see
    ``ops.registration.register_batch``). Returns (shifts, responses,
    corrected), all batch-sharded.
    """
    from sequitr_tpu.ops import registration as reg

    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis_name)

    return jax.jit(
        lambda ref, frames: reg._register_batch_impl(
            ref, frames, subpixel, window, refine, resample
        ),
        in_shardings=(rep, shd),
        # all three outputs carry the batch dim (resample=False returns a
        # (B,) dummy scalar batch), so all shard over it
        out_shardings=(shd, shd, shd),
    )


def make_dp_localizer(
    mesh: Mesh,
    *,
    max_peaks: int = 256,
    min_distance: int = 2,
    window: int = 7,
    sigma: float = 1.5,
    axis_name: str = "data",
) -> Callable:
    """DP form of single-molecule emitter localization.

    ``localize(frames, thresholds)`` with ``frames`` (D, H, W) and
    per-frame ``thresholds`` (D,) both sharded over ``data``: every chip
    runs detect (max-pool NMS + top_k) + vmapped Gaussian-mask fits on
    its shard of frames in one dispatch with ZERO inter-chip traffic —
    localization is per-frame independent, the same embarrassingly
    parallel shape as first-mode registration. Thresholds are traced
    operands, so per-frame robust (median+MAD) values dispatch without
    retracing. Returns ``(yx, valid, fits)`` with every leaf carrying
    the leading batch dim, all batch-sharded.
    """
    from sequitr_tpu import psf

    shd = batch_sharded(mesh, axis_name)

    def one(frame, thr):
        yx, valid = psf.detect_peaks(frame, thr, max_peaks, min_distance)
        fits = psf.fit_peaks_gaussian(frame, yx, window=window, sigma=sigma)
        return yx, valid, fits

    return jax.jit(
        jax.vmap(one),
        in_shardings=(shd, shd),
        out_shardings=shd,
    )


def make_dp_localizer3d(
    mesh: Mesh,
    *,
    max_peaks: int = 256,
    min_distance: int = 2,
    min_distance_z: int = 1,
    window: int = 7,
    window_z: int = 5,
    sigma: float = 1.5,
    sigma_z: float = 1.5,
    axis_name: str = "data",
) -> Callable:
    """DP form of VOLUMETRIC emitter localization.

    ``localize(volumes, thresholds)`` with ``volumes`` (D, Z, H, W) and
    per-volume ``thresholds`` (D,) sharded over ``data``: each chip runs
    3D detect (reduce_window NMS + top_k) + anisotropic Gaussian-mask
    fits on its shard of TIMEPOINTS with zero inter-chip traffic — a
    volumetric SMLM timelapse is embarrassingly parallel over t exactly
    like 2D frames. Returns ``(zyx, valid, fits)``, all batch-sharded.
    """
    from sequitr_tpu import psf

    shd = batch_sharded(mesh, axis_name)

    def one(vol, thr):
        zyx, valid = psf.detect_peaks_3d(
            vol, thr, max_peaks, min_distance, min_distance_z
        )
        fits = psf.fit_peaks_gaussian_3d(
            vol, zyx, window=window, window_z=window_z,
            sigma=sigma, sigma_z=sigma_z,
        )
        return zyx, valid, fits

    return jax.jit(
        jax.vmap(one),
        in_shardings=(shd, shd),
        out_shardings=shd,
    )


def make_dp_seam_correlator(
    mesh: Mesh,
    *,
    subpixel: bool = True,
    window: bool = True,
    refine: int = 2,
    axis_name: str = "data",
) -> Callable:
    """DP form of mosaic seam estimation (``mosaic.pair_offsets``).

    ``correlate(refs, movs)`` with matching (P, h, w) strip stacks
    shards the PAIR axis over ``data``: each chip phase-correlates its
    share of seams with zero inter-chip traffic (seam estimates are
    independent — a 20x20 slide scan has 760 of them). Seam counts
    rarely divide the mesh, so the pair axis is padded host-side up to
    a multiple of the device count (repeating the last pair — a real
    correlation, so no NaN/garbage rides the collective-free graph) and
    the padding is sliced off the fetched result. Returns
    ``(shifts (P, 2), responses (P,))``.
    """
    import jax.numpy as jnp

    from sequitr_tpu.ops import registration as reg_lib

    shd = batch_sharded(mesh, axis_name)
    n_dev = int(mesh.devices.size)

    def one(r, m):
        return reg_lib.phase_correlate(
            r, m, subpixel=subpixel, window=window, refine=refine
        )

    fn = jax.jit(jax.vmap(one), in_shardings=(shd, shd), out_shardings=shd)

    def correlate(refs, movs):
        refs = jnp.asarray(refs, jnp.float32)
        movs = jnp.asarray(movs, jnp.float32)
        p = refs.shape[0]
        pad = (-p) % n_dev
        if pad:
            refs = jnp.concatenate([refs, jnp.repeat(refs[-1:], pad, 0)])
            movs = jnp.concatenate([movs, jnp.repeat(movs[-1:], pad, 0)])
        shifts, resp = fn(refs, movs)
        return shifts[:p], resp[:p]

    return correlate


def make_dp_localizer_astig(
    mesh: Mesh,
    calib,
    *,
    max_peaks: int = 256,
    min_distance: int = 2,
    window: Optional[int] = None,
    n_grid: int = 241,
    axis_name: str = "data",
) -> Callable:
    """DP form of ASTIGMATIC 3D-from-2D emitter localization.

    ``localize(frames, thresholds)`` with ``frames`` (D, H, W) and
    per-frame ``thresholds`` (D,) sharded over ``data``: each chip runs
    detect + elliptical adaptive-width fits + calibration-curve z
    inversion on its shard of frames — the whole Huang-2008 chain is one
    jit graph per frame (``psf._detect_and_fit_astig``), so sharding the
    frame axis costs zero inter-chip traffic exactly like the plain-2D
    and volumetric DP localizers. The calibration coefficients close
    over the graph as constants; ``window`` defaults to the
    calibration's own fit window so the width estimator's truncation
    bias cancels. Returns ``(yx, valid, fits)`` (fits incl. ``z`` in
    calibration units), all batch-sharded.
    """
    import jax.numpy as jnp

    from sequitr_tpu import psf

    if window is None:
        window = calib.window
    coef = jnp.asarray(
        tuple(calib.qx) + tuple(calib.qy) + tuple(calib.z_range),
        jnp.float32,
    )
    shd = batch_sharded(mesh, axis_name)

    def one(frame, thr):
        return psf._detect_and_fit_astig(
            frame, thr, coef, max_peaks=max_peaks,
            min_distance=min_distance, window=window, n_grid=n_grid,
        )

    return jax.jit(
        jax.vmap(one),
        in_shardings=(shd, shd),
        out_shardings=shd,
    )


def make_dp_deconvolver(
    mesh: Mesh,
    kernel,
    iterations: int,
    axis_name: str = "data",
) -> Callable:
    """DP Richardson–Lucy deconvolution: ``deconv(frames)`` with
    ``frames`` (D, H, W) sharded over ``data`` — each chip iterates the
    RL multiplicative updates (FFT convolutions) on its shard of frames
    against the replicated PSF with zero inter-chip traffic; per-frame
    deconvolution is embarrassingly parallel exactly like first-mode
    registration. The kernel and iteration count close over the graph
    (static shapes, fixed unrolled/scanned iteration count)."""
    import jax.numpy as jnp

    from sequitr_tpu import psf

    shd = batch_sharded(mesh, axis_name)
    kern = jnp.asarray(kernel)

    def one(frame):
        # channel-aware: (H, W) or (H, W, C), ONE definition shared
        # with the streaming path (psf.richardson_lucy_frame)
        return psf.richardson_lucy_frame(frame, kern, iterations)

    return jax.jit(jax.vmap(one), in_shardings=shd, out_shardings=shd)
