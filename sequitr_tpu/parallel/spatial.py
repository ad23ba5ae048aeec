"""Spatially-sharded U-Net inference: halo exchange over ICI.

The reference has no distributed execution; this is the rebuild's
"CP-for-images" extension (SURVEY.md §5 'Long-context / sequence
parallelism' analogue): a single large frame's H axis is sharded across the
mesh and every 3x3 conv exchanges one boundary row with each neighbor over
ICI (``lax.ppermute`` inside ``shard_map``), so the result is **exactly**
the whole-frame forward — not an overlap-stitch approximation:

* interior shard boundaries receive true neighbor rows (== SAME conv's view
  of adjacent pixels);
* global top/bottom edges receive zeros (== SAME zero padding);
* max-pool halves rows locally (local row count stays even by construction);
* the kernel-2/stride-2 transposed conv maps local rows to local rows with
  no cross-boundary dependency, so the decoder needs no halo.

Use when one frame is too large for a chip's HBM (e.g. 16k x 16k
slide-scanner mosaics) or to cut single-frame latency ~Dx. This module is
the inference-mode path: batch-norm must be folded
(``unet.fold_batchnorm``) or absent. TRAINING on spatially-sharded frames
(halo-exchange backward + psum'd BN batch statistics) lives in
``sequitr_tpu.parallel.spatial_train``.

Multi-channel frames ride their channel axis unsharded; space-to-depth
(fast-preset) configs shard too — the block rearrangement is shard-local
whenever H/device divides the s2d factor (always true under the
requirements below).

Requirements: H divisible by n_devices, and H/n_devices (and W) divisible
by ``cfg.min_input_multiple`` (pool factor x space_to_depth).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sequitr_tpu.models import unet
from sequitr_tpu.models.unet import _conv, _conv_transpose

__all__ = [
    "spatial_unet2d_infer",
    "spatial_unet3d_infer",
    "spatial_gan_enhance",
    "hybrid_unet2d_infer",
    "hybrid_gan_enhance",
]


def _neighbor_rows(x: jnp.ndarray, axis_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fetch (last row of previous shard, first row of next shard).

    Edge shards get zero rows — reproducing SAME zero padding globally.
    ``x``: (H_loc, W, C).
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    fwd = [(j, (j + 1) % n) for j in range(n)]  # send to next: receive from prev
    bwd = [(j, (j - 1) % n) for j in range(n)]  # send to prev: receive from next
    from_prev = jax.lax.ppermute(x[-1:], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:1], axis_name, bwd)
    zero = jnp.zeros_like(from_prev)
    from_prev = jnp.where(i == 0, zero, from_prev)
    from_next = jnp.where(i == n - 1, zero, from_next)
    return from_prev, from_next


def _conv3x3_halo(x, p, cfg, axis_name):
    """SAME 3^dims conv on an axis-0-sharded local tensor via halo exchange.

    ``x``: (S_loc, *rest, C) — rows for 2D (H-sharded), planes for 3D
    (Z-sharded); ``_neighbor_rows`` slices axis 0, so the exchange is
    rank-agnostic. The sharded axis gets its halo (VALID), the unsharded
    spatial axes keep SAME(1,1).
    """
    top, bot = _neighbor_rows(x, axis_name)
    padded = jnp.concatenate([top, x, bot], axis=0)
    pad = ((0, 0),) + ((1, 1),) * (cfg.dims - 1)
    y = _conv(padded[None], p, cfg, padding=pad)
    return y[0]


def _block_halo(x, p, cfg, axis_name):
    for i in (1, 2):
        x = _conv3x3_halo(x, p[f"conv{i}"], cfg, axis_name)
        x = jax.nn.relu(x)
    return x


def _maxpool_local(x, dims):
    """2^dims max pool on a local (S_loc, *rest, C) tensor — local on the
    sharded axis because S_loc stays even through every level."""
    if dims == 2:
        h, w, c = x.shape
        x = x.reshape(h // 2, 2, w // 2, 2, c)
        return jnp.max(x, axis=(1, 3))
    z, h, w, c = x.shape
    x = x.reshape(z // 2, 2, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(1, 3, 5))


def _make_local_logits(cfg: unet.UNetConfig, run_cfg, axis_name: str):
    """Per-shard U-Net logits over an axis-0-sharded local tensor.

    The shared halo-exchange core behind both the segmentation forward
    (softmax/argmax head) and the GAN generator pass (activation head).
    """

    def local_logits(params_l, x_local):
        # x_local: (*spatial_loc,) single-channel or (*spatial_loc, C)
        if x_local.ndim == cfg.dims:
            x_local = x_local[..., None]
        x = x_local.astype(jnp.float32)
        s2d = cfg.space_to_depth
        if s2d > 1:
            # space-to-depth is a non-overlapping block rearrangement, so
            # applying it per shard == the global op whenever H_loc % s2d
            # == 0 (guaranteed: H_loc % min_input_multiple == 0, which
            # includes the s2d factor). Halos are then exchanged at the
            # reduced resolution, exactly as the unsharded graph convolves.
            from sequitr_tpu.models.unet import _space_to_depth

            x = _space_to_depth(x[None], s2d)[0]
        skips = []
        for lvl in range(cfg.depth):
            if lvl > 0:
                x = _maxpool_local(x, cfg.dims)
            x = _block_halo(x, params_l["enc"][lvl], run_cfg, axis_name)
            if lvl < cfg.depth - 1:
                skips.append(x)
        for i, lvl in enumerate(reversed(range(cfg.depth - 1))):
            skip = skips[lvl]
            x = _conv_transpose(x[None], params_l["up"][i], run_cfg)[0]
            x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
            x = _block_halo(x, params_l["dec"][i], run_cfg, axis_name)
        logits = _conv(x[None], params_l["head"], run_cfg)[0]
        if s2d > 1:
            from sequitr_tpu.models.unet import _depth_to_space

            logits = _depth_to_space(logits[None], s2d)[0]
        return logits

    return local_logits


def _make_local_forward(
    cfg: unet.UNetConfig,
    run_cfg,
    axis_name: str,
    probs_dtype: str = "float32",
    labels_dtype: str = "int32",
):
    """Per-shard U-Net forward over (H_loc, W) rows with halo-exchange convs.

    ``probs_dtype``/``labels_dtype`` cast the outputs ON DEVICE (argmax
    runs on the f32 maps first), matching the streaming path's D2H-halving
    TileConfig knobs."""
    local_logits = _make_local_logits(cfg, run_cfg, axis_name)

    def local_forward(params_l, x_local):
        logits = local_logits(params_l, x_local)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        labels = jnp.argmax(probs, axis=-1).astype(jnp.dtype(labels_dtype))
        return probs.astype(jnp.dtype(probs_dtype)), labels

    return local_forward


def _validate_spatial(cfg: unet.UNetConfig, n: int, frame_spatial):
    if cfg.dims != len(frame_spatial):
        raise ValueError(
            f"model is {cfg.dims}D but frame_spatial has "
            f"{len(frame_spatial)} axes"
        )
    s0, *rest = frame_spatial
    axis0 = "H" if cfg.dims == 2 else "Z"
    if s0 % n:
        raise ValueError(f"{axis0}={s0} not divisible by {n} devices")
    s_loc = s0 // n
    if s_loc % cfg.min_input_multiple:
        raise ValueError(
            f"{axis0}/device={s_loc} not divisible by {cfg.min_input_multiple}"
        )
    for s in rest:
        # unsharded axes are still s2d-rearranged and pooled locally
        if s % cfg.min_input_multiple:
            raise ValueError(
                f"axis size {s} not divisible by {cfg.min_input_multiple} "
                "(pool factor x space_to_depth)"
            )
    if cfg.upsample != "transpose":
        raise NotImplementedError("spatial sharding supports transpose upsampling")


def spatial_unet2d_infer(
    cfg: unet.UNetConfig,
    params,
    state,
    mesh: Mesh,
    frame_spatial: Tuple[int, int],
    axis_name: str = "data",
    probs_dtype: str = "float32",
    labels_dtype: str = "int32",
):
    """Build ``fn(params, state, frame) -> (probs, labels)``, H-sharded.

    ``frame``: (H, W) float32 — or (H, W, C) when the model is
    multi-channel (``cfg.in_channels > 1``) — already normalized (run
    percentile normalization beforehand — it is global-reduction work that
    XLA handles well unsharded, or shard it separately). Output matches the
    unsharded ``unet.apply`` exactly (f32 compute) up to float
    reassociation.
    """
    return _spatial_unet_infer(
        cfg, params, state, mesh, frame_spatial, axis_name,
        probs_dtype, labels_dtype,
    )


def spatial_unet3d_infer(
    cfg: unet.UNetConfig,
    params,
    state,
    mesh: Mesh,
    vol_spatial: Tuple[int, int, int],
    axis_name: str = "data",
    probs_dtype: str = "float32",
    labels_dtype: str = "int32",
):
    """Volumetric variant: a (Z, H, W[, C]) volume Z-sharded across chips.

    For z-stacks whose activations exceed one chip's HBM (SURVEY.md §5
    memory-wall analogue): every 3x3x3 conv exchanges one boundary PLANE
    with each neighbor over ICI; pooling and the kernel-2/stride-2
    transposed conv stay plane-local, so the result is exactly the
    unsharded 3D forward. Requirements mirror the 2D form with Z as the
    sharded axis.
    """
    return _spatial_unet_infer(
        cfg, params, state, mesh, vol_spatial, axis_name,
        probs_dtype, labels_dtype,
    )


def _spatial_unet_infer(
    cfg, params, state, mesh, frame_spatial, axis_name,
    probs_dtype="float32", labels_dtype="int32",
):
    n = mesh.devices.size
    _validate_spatial(cfg, n, frame_spatial)

    # fold BN so the sharded graph is pure conv/relu
    if cfg.norm == "batch":
        run_cfg, fold = cfg, True
    else:
        run_cfg, fold = cfg, False

    local_forward = _make_local_forward(
        cfg, run_cfg, axis_name, probs_dtype, labels_dtype
    )

    # axis 0 sharded; other spatial axes and channels (if any) unsharded
    nd = cfg.dims + (0 if cfg.in_channels == 1 else 1)
    in_spec = P(axis_name, *([None] * (nd - 1)))
    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=(
            P(axis_name, *([None] * cfg.dims)),
            P(axis_name, *([None] * (cfg.dims - 1))),
        ),
        check_vma=False,
    )

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, in_spec)

    @jax.jit
    def _fn(params_in, state_in, frame):
        if fold:
            _, p_run, _ = unet.fold_batchnorm(cfg, params_in, state_in)
        else:
            p_run = params_in
        return sharded(p_run, frame)

    def fn(params_in, state_in, frame):
        # explicit placement: params/state replicated across the mesh,
        # the frame row-sharded — callers may hand us single-device arrays
        # (e.g. fresh from an orbax restore)
        params_in = jax.device_put(params_in, rep)
        state_in = jax.device_put(state_in, rep)
        frame = jax.device_put(frame, row_sharded)
        return _fn(params_in, state_in, frame)

    return fn


def spatial_gan_enhance(
    gan_cfg,
    params,
    state,
    mesh: Mesh,
    frame_spatial: Tuple[int, int],
    axis_name: str = "data",
    out_dtype: str = "float32",
):
    """H-sharded GAN generator pass: giant enhancement frames across chips.

    The pix2pix generator IS the U-Net core plus an output activation
    (``models.gan.generator_apply``), so the same halo-exchange local
    kernel serves it: rows sharded, every 3x3 conv exchanging boundary
    rows over ICI, exactly the whole-frame generator output. Fold the
    generator BN first (``gan.fold_generator``) — the caller passes the
    FOLDED (cfg, params); batch-stats BN is rejected.

    Returns ``fn(params, state, frame) -> (H, W, C_out)``; ``frame`` is
    (H, W) or (H, W, C_in), already normalized.
    """
    ucfg = gan_cfg.generator_config
    n = mesh.devices.size
    _validate_spatial(ucfg, n, frame_spatial)
    if ucfg.norm == "batch":
        raise ValueError(
            "fold the generator first (models.gan.fold_generator)"
        )
    local_logits = _make_local_logits(ucfg, ucfg, axis_name)
    activation = gan_cfg.output_activation

    def local_enhance(gen_params_l, x_local):
        y = local_logits(gen_params_l, x_local).astype(jnp.float32)
        if activation == "tanh":
            y = jnp.tanh(y)
        elif activation == "sigmoid":
            y = jax.nn.sigmoid(y)
        return y.astype(jnp.dtype(out_dtype))

    nd = ucfg.dims + (0 if ucfg.in_channels == 1 else 1)
    in_spec = P(axis_name, *([None] * (nd - 1)))
    sharded = shard_map(
        local_enhance,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, in_spec)

    @jax.jit
    def _fn(gen_params, frame):
        return sharded(gen_params, frame)

    def fn(params_in, state_in, frame):
        # replicate ONLY the generator weights — the discriminator stack
        # is never read by the sharded pass and would waste HBM on every
        # chip (code-review r3)
        gen = jax.device_put(params_in["gen"], rep)
        frame = jax.device_put(frame, row_sharded)
        return _fn(gen, frame)

    return fn


def hybrid_unet2d_infer(
    cfg: unet.UNetConfig,
    params,
    state,
    mesh: Mesh,
    frame_spatial: Tuple[int, int],
    batch: int,
    data_axis: str = "data",
    space_axis: str = "space",
    probs_dtype: str = "float32",
    labels_dtype: str = "int32",
):
    """Build ``fn(params, state, frames) -> (probs, labels)`` on a 2D mesh.

    Composed parallelism for timelapse serving of giant frames: the frame
    BATCH is data-parallel over ``data_axis`` while each frame's rows are
    spatially sharded over ``space_axis`` — e.g. 8 chips = 2 frames in
    flight x 4-way halo-exchange within each (DP x CP-for-images; the
    reference has neither — SURVEY.md §2 'Parallelism strategies'
    extension). ``frames``: (batch, H, W) float32 — (batch, H, W, C) for
    multi-channel models — already normalized. Exactly equal to the
    unsharded per-frame forward, like ``spatial_unet2d_infer`` (same local
    kernel, vmapped over the local batch; ppermute halos move only within
    each data slice).
    """
    d = mesh.shape[data_axis]
    s = mesh.shape[space_axis]
    _validate_spatial(cfg, s, frame_spatial)
    if batch % d:
        raise ValueError(f"batch={batch} not divisible by {d} data shards")

    run_cfg, fold = cfg, cfg.norm == "batch"
    local_forward = _make_local_forward(
        cfg, run_cfg, space_axis, probs_dtype, labels_dtype
    )

    def local_batch(params_l, x_local):  # x_local: (B_loc, H_loc, W[, C])
        return jax.vmap(local_forward, in_axes=(None, 0))(params_l, x_local)

    in_spec = (
        P(data_axis, space_axis, None)
        if cfg.in_channels == 1
        else P(data_axis, space_axis, None, None)
    )
    sharded = shard_map(
        local_batch,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=(
            P(data_axis, space_axis, None, None),
            P(data_axis, space_axis, None),
        ),
        check_vma=False,
    )

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    sharded_in = NamedSharding(mesh, in_spec)

    @jax.jit
    def _fn(params_in, state_in, frames):
        if fold:
            _, p_run, _ = unet.fold_batchnorm(cfg, params_in, state_in)
        else:
            p_run = params_in
        return sharded(p_run, frames)

    def fn(params_in, state_in, frames):
        params_in = jax.device_put(params_in, rep)
        state_in = jax.device_put(state_in, rep)
        frames = jax.device_put(frames, sharded_in)
        return _fn(params_in, state_in, frames)

    return fn


def hybrid_gan_enhance(
    gan_cfg,
    params,
    state,
    mesh: Mesh,
    frame_spatial: Tuple[int, int],
    batch: int,
    data_axis: str = "data",
    space_axis: str = "space",
    out_dtype: str = "float32",
):
    """DP x spatial GAN enhancement on a 2-D mesh (timelapses of giants).

    The generator counterpart of ``hybrid_unet2d_infer``: ``batch`` frames
    in flight on the data axis, each H-sharded ``space``-ways with halo
    exchange. Pass the FOLDED (cfg, params) (``gan.fold_generator``).
    ``frames``: (batch, H, W[, C_in]) float32, already normalized ->
    (batch, H, W, C_out).
    """
    ucfg = gan_cfg.generator_config
    d = mesh.shape[data_axis]
    s = mesh.shape[space_axis]
    _validate_spatial(ucfg, s, frame_spatial)
    if batch % d:
        raise ValueError(f"batch={batch} not divisible by {d} data shards")
    if ucfg.norm == "batch":
        raise ValueError("fold the generator first (models.gan.fold_generator)")

    local_logits = _make_local_logits(ucfg, ucfg, space_axis)
    activation = gan_cfg.output_activation

    def local_enhance(gen_params_l, x_local):
        y = local_logits(gen_params_l, x_local).astype(jnp.float32)
        if activation == "tanh":
            y = jnp.tanh(y)
        elif activation == "sigmoid":
            y = jax.nn.sigmoid(y)
        return y.astype(jnp.dtype(out_dtype))

    def local_batch(gen_params_l, x_local):  # (B_loc, H_loc, W[, C])
        return jax.vmap(local_enhance, in_axes=(None, 0))(gen_params_l, x_local)

    in_spec = (
        P(data_axis, space_axis, None)
        if ucfg.in_channels == 1
        else P(data_axis, space_axis, None, None)
    )
    sharded = shard_map(
        local_batch,
        mesh=mesh,
        in_specs=(P(), in_spec),
        out_specs=P(data_axis, space_axis, None, None),
        check_vma=False,
    )

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    sharded_in = NamedSharding(mesh, in_spec)

    @jax.jit
    def _fn(gen_params, frames):
        return sharded(gen_params, frames)

    def fn(params_in, state_in, frames):
        gen = jax.device_put(params_in["gen"], rep)  # generator only
        frames = jax.device_put(frames, sharded_in)
        return _fn(gen, frames)

    return fn
