"""Polyphase serving forward: the exact space-to-depth reformulation.

The round-4 roofline showed the two thin full-resolution levels of the
parity U-Net dominate the 1024^2 serving graph (enc0 + dec0 = 13.5 of
15.8 ms at 37-41% of the conv ceiling: 32 output channels feed a
quarter of the 128-wide MXU). Polyphase decomposition runs BOTH thin
levels at half resolution x 4-wide channels with the SAME weights,
exactly (up to float reassociation):

* a stride-1 3x3 conv on (2H, 2W, C) == a 3x3 conv on the (H, W, 4C)
  space-to-depth phase tensor with a structured-zero rearranged kernel
  (tap dy contributes to block offset s where dy = 2s + p - a);
* the 2x2-stride-2 up-conv == ONE 1x1 phase conv (no tap overlap);
* 2x2 max-pool == max over the 4 phase groups (no spatial op);
* the 1x1 head == a per-phase batched matmul;
* bias/ReLU/folded-BN are per-channel elementwise, phase channels are
  relabeled pixels;
* the skip connection stays in the phase domain — the serving graph
  never materializes a full-resolution intermediate at all.

The dense phase conv spends 4x the MACs of the original thin conv
(9 of every 36 tap/phase-pair slots are nonzero), traded against full
MXU width. Measured on the v5e chip (studies/polyphase_conv.py,
round 5): whole-graph 1024^2 serving 15.85 -> 10.05 ms in bf16
(1.58x; f32 12.79 -> 10.40, 1.23x), argmax agreement 0.9999 vs the
production forward. Exposed as ``TileConfig(polyphase=True)`` /
the segmentation pipelines' ``polyphase`` param.

Spec: SURVEY.md §6 north-star metric; round-4 VERDICT item 3. The
reference (TF-1.x sequitr) has no counterpart — single-resolution TF
graphs; this is a TPU-hardware-shaped serving transform.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sequitr_tpu.models import unet

__all__ = [
    "eligible", "eligible3d", "phase_kernel", "phase_up_kernel",
    "apply", "apply3d", "apply_train", "apply3d_train",
]


def eligible(cfg: unet.UNetConfig, spatial: Tuple[int, ...]) -> bool:
    """True when the polyphase forward covers this serving config:
    2D, no model-level space-to-depth, transposed-conv upsampling,
    folded/absent norm, and even spatial dims (phase factor 2)."""
    return (
        cfg.dims == 2
        and cfg.depth >= 2  # level 0's pool/up/skip/dec structure
        and cfg.space_to_depth == 1
        and cfg.upsample == "transpose"
        and cfg.norm == "none"
        and all(s % 2 == 0 for s in spatial)
    )


def phase_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) stride-1 kernel -> (3, 3, 4C_in, 4C_out).

    Traceable (pure jnp): usable with params as runtime jit arguments —
    the rearrangement is a few small concatenates, negligible next to
    the convs it feeds. Phase-channel layout matches
    ``unet._space_to_depth`` for s=2: index (p*2 + q) * C + c.
    """
    if w.shape[:2] != (3, 3):
        raise ValueError(f"phase_kernel expects a 3x3 kernel, got {w.shape}")
    zero = jnp.zeros_like(w[0, 0])
    rows = []
    for sy in (-1, 0, 1):
        cols = []
        for sx in (-1, 0, 1):
            in_blocks = []
            for p in (0, 1):
                for q in (0, 1):
                    out_blocks = []
                    for a in (0, 1):
                        for b in (0, 1):
                            dy = 2 * sy + p - a
                            dx = 2 * sx + q - b
                            ok = dy in (-1, 0, 1) and dx in (-1, 0, 1)
                            out_blocks.append(w[dy + 1, dx + 1] if ok else zero)
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def phase_up_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, C_in, C_out) stride-2 transposed-conv kernel -> (C_in, 4C_out).

    Kernel-2 stride-2 has no tap overlap: output phase (a, b) is the
    1x1 map w[a, b]; all four phases emit from one matmul.
    """
    if w.shape[:2] != (2, 2):
        raise ValueError(f"phase_up_kernel expects a 2x2 kernel, got {w.shape}")
    return jnp.concatenate(
        [w[a, b] for a in (0, 1) for b in (0, 1)], axis=-1
    )


def _tile4(b: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector -> per-phase-channel vector (phase-major)."""
    return jnp.concatenate([b, b, b, b])


@jax.custom_vjp
def _phase_max(e: jnp.ndarray) -> jnp.ndarray:
    """max over the phase axis of (N, H, W, 4, C) == the 2x2 max-pool.

    Forward is plain ``jnp.max``; the custom backward routes the
    cotangent to the FIRST maximal phase (phase index order == the pool
    window's row-major order), matching XLA's select-and-scatter
    semantics for ``lax.reduce_window`` max-pool gradients exactly —
    ``jnp.max``'s default vjp splits ties evenly, and ReLU activations
    tie at zero constantly, so without this the polyphase training
    gradients diverge from the production step at every tied window.
    """
    return jnp.max(e, axis=3)


def _phase_max_fwd(e):
    m = jnp.max(e, axis=3)
    return m, (e, m)


def _phase_max_bwd(res, g):
    e, m = res
    is_max = e == m[:, :, :, None, :]
    first = jnp.cumsum(is_max.astype(jnp.int32), axis=3) == 1
    return (jnp.where(is_max & first, g[:, :, :, None, :], 0.0),)


_phase_max.defvjp(_phase_max_fwd, _phase_max_bwd)


def _phase_conv(x, w, b, cfg: unet.UNetConfig):
    """3x3 phase conv + bias, numerics mirroring ``unet._conv``."""
    y = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype),
        w.astype(cfg.compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=unet._conv_dim_numbers(2),
        preferred_element_type=(
            jnp.float32 if cfg.compute_dtype == jnp.float32 else None
        ),
    )
    return y.astype(jnp.float32) + b


def apply(
    cfg: unet.UNetConfig,
    params: unet.Params,
    state: unet.State,
    x: jnp.ndarray,
    train: bool = False,
) -> jnp.ndarray:
    """Serving forward equal to ``unet.apply(...)[0]`` (float32 logits)
    with level 0 — both thin full-res blocks, pool, up-conv, skip and
    head — in the polyphase domain. ``x``: (N, H, W, C_in), H, W even.

    Raises ValueError for configs outside :func:`eligible`'s cover (the
    callers gate on it; the raise keeps misuse loud).
    """
    if train:
        raise ValueError("polyphase.apply is a serving-only forward")
    if not eligible(cfg, x.shape[1:-1]):
        raise ValueError(
            "polyphase.apply requires a folded 2D transpose-upsample "
            f"config with even spatial dims; got {cfg} on {x.shape}"
        )
    relu = jax.nn.relu
    enc0, dec0 = params["enc"][0], params["dec"][-1]
    up0, head = params["up"][-1], params["head"]

    # --- enc0 in the phase domain: (N, H/2, W/2, 4C_in) -> (..., 4f0)
    xp = unet._space_to_depth(x.astype(jnp.float32), 2)
    e0 = relu(_phase_conv(
        xp, phase_kernel(enc0["conv1"]["w"]), _tile4(enc0["conv1"]["b"]), cfg
    ))
    e0 = relu(_phase_conv(
        e0, phase_kernel(enc0["conv2"]["w"]), _tile4(enc0["conv2"]["b"]), cfg
    ))

    # --- pool = max over the 4 phase groups
    n, h, w, c4 = e0.shape
    f0 = c4 // 4
    xmid = _phase_max(e0.reshape(n, h, w, 4, f0))

    # --- middle of the net: the unchanged production path
    skips = []
    for lvl in range(1, cfg.depth):
        if lvl > 1:
            xmid = unet._maxpool(xmid, cfg)
        xmid, _ = unet._block_apply(
            xmid, params["enc"][lvl], state["enc"][lvl], cfg, False
        )
        if lvl < cfg.depth - 1:
            skips.append(xmid)
    for i, lvl in enumerate(reversed(range(1, cfg.depth - 1))):
        skip = skips[lvl - 1]
        xmid = unet._upsample(xmid, params["up"][i], skip.shape, cfg)
        xmid = jnp.concatenate([skip, xmid.astype(skip.dtype)], axis=-1)
        xmid, _ = unet._block_apply(
            xmid, params["dec"][i], state["dec"][i], cfg, False
        )

    # --- up-conv into the phase domain: one 1x1 making all 4 phases
    upw = phase_up_kernel(up0["w"]).astype(cfg.compute_dtype)
    up = jnp.einsum(
        "nhwc,cd->nhwd", xmid.astype(cfg.compute_dtype), upw,
        preferred_element_type=jnp.float32,
    ) + _tile4(up0["b"])

    # --- phase-aware concat: [skip, up] within each phase group
    cat = jnp.concatenate(
        [e0.reshape(n, h, w, 4, f0), up.reshape(n, h, w, 4, f0)], axis=-1
    ).reshape(n, h, w, 4 * 2 * f0)

    # --- dec0 in the phase domain
    d0 = relu(_phase_conv(
        cat, phase_kernel(dec0["conv1"]["w"]), _tile4(dec0["conv1"]["b"]), cfg
    ))
    d0 = relu(_phase_conv(
        d0, phase_kernel(dec0["conv2"]["w"]), _tile4(dec0["conv2"]["b"]), cfg
    ))

    # --- head: per-phase matmul, then depth-to-space on the class maps
    hw_ = head["w"][0, 0].astype(cfg.compute_dtype)
    k = hw_.shape[-1]
    logits_p = jnp.einsum(
        "nhwpc,ck->nhwpk",
        d0.reshape(n, h, w, 4, f0).astype(cfg.compute_dtype), hw_,
        preferred_element_type=jnp.float32,
    ) + head["b"]
    logits = unet._depth_to_space(logits_p.reshape(n, h, w, 4 * k), 2)
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# training forward: the same reformulation under jax.grad
# ---------------------------------------------------------------------------


def _phase_batch_norm(y, p, s, cfg: unet.UNetConfig, train: bool):
    """BatchNorm on a phase-domain activation with FULL-RESOLUTION
    semantics, exactly.

    Full-res BN reduces over (N, H, W) per channel; the phase tensor
    (N, H/2, W/2, 4C) holds the SAME pixel multiset with channel c
    spread over 4 phase groups — reducing over (N, h, w, phase) gives
    identical statistics (up to summation order), so the running-stats
    update and the normalized output match ``unet._batch_norm`` on the
    equivalent full-res activation. Per-channel params tile across the
    4 phase groups.
    """
    n, h, w, c4 = y.shape
    c = c4 // 4
    y32 = y.astype(jnp.float32).reshape(n, h, w, 4, c)
    if train:
        mean = jnp.mean(y32, axis=(0, 1, 2, 3))
        var = jnp.var(y32, axis=(0, 1, 2, 3))
        m = cfg.bn_momentum
        new_s = {
            "mean": m * s["mean"] + (1 - m) * mean,
            "var": m * s["var"] + (1 - m) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + cfg.bn_eps)
    out = (y32 - mean) * inv * p["scale"] + p["bias"]
    return out.reshape(n, h, w, c4), new_s


def _phase_block_apply(xp, p, s, cfg: unet.UNetConfig, train: bool):
    """conv -> norm -> relu, twice, in the phase domain (mirrors
    ``unet._block_apply`` semantics on the equivalent full-res tensor)."""
    new_s = {}
    for i in (1, 2):
        conv = p[f"conv{i}"]
        xp = _phase_conv(
            xp, phase_kernel(conv["w"]), _tile4(conv["b"]), cfg
        )
        if cfg.norm == "batch":
            xp, new_s[f"bn{i}"] = _phase_batch_norm(
                xp, p[f"bn{i}"], s[f"bn{i}"], cfg, train
            )
        xp = jax.nn.relu(xp)
    return xp, new_s


def apply_train(
    cfg: unet.UNetConfig,
    params: unet.Params,
    state: unet.State,
    x: jnp.ndarray,
    train: bool = True,
) -> Tuple[jnp.ndarray, unet.State]:
    """Training forward equal to ``unet.apply(cfg, params, state, x,
    train)`` — (float32 logits, new_state) — with level 0 in the phase
    domain. Unlike :func:`apply` this supports ``norm='batch'`` (the
    phase-group reduction reproduces full-resolution BN statistics
    exactly) and returns the updated BN state, so ``jax.grad`` through
    it trains the SAME model: gradients w.r.t. the original weights
    flow through the linear ``phase_kernel`` rearrangement.

    Measured motivation: the serving A/B showed the thin full-res
    levels at a quarter of MXU width; the training step pays them in
    the forward AND the backward.
    """
    if cfg.dims != 2 or cfg.space_to_depth != 1 or cfg.depth < 2:
        raise ValueError(
            "polyphase.apply_train covers 2D space_to_depth=1 models of "
            f"depth >= 2; got dims={cfg.dims} s2d={cfg.space_to_depth} "
            f"depth={cfg.depth}"
        )
    if cfg.upsample != "transpose":
        raise ValueError("polyphase.apply_train requires upsample='transpose'")
    if any(d % 2 for d in x.shape[1:-1]):
        raise ValueError(f"even spatial dims required, got {x.shape}")
    new_state: unet.State = {"enc": [None] * cfg.depth,
                             "dec": [None] * (cfg.depth - 1)}

    # --- enc0 in the phase domain
    xp = unet._space_to_depth(x.astype(jnp.float32), 2)
    e0, new_state["enc"][0] = _phase_block_apply(
        xp, params["enc"][0], state["enc"][0], cfg, train
    )

    n, h, w, c4 = e0.shape
    f0 = c4 // 4
    xmid = _phase_max(e0.reshape(n, h, w, 4, f0))

    # --- middle levels: the unchanged production path
    skips = []
    for lvl in range(1, cfg.depth):
        if lvl > 1:
            xmid = unet._maxpool(xmid, cfg)
        xmid, new_state["enc"][lvl] = unet._block_apply(
            xmid, params["enc"][lvl], state["enc"][lvl], cfg, train
        )
        if lvl < cfg.depth - 1:
            skips.append(xmid)
    for i, lvl in enumerate(reversed(range(1, cfg.depth - 1))):
        skip = skips[lvl - 1]
        xmid = unet._upsample(xmid, params["up"][i], skip.shape, cfg)
        xmid = jnp.concatenate([skip, xmid.astype(skip.dtype)], axis=-1)
        xmid, new_state["dec"][i] = unet._block_apply(
            xmid, params["dec"][i], state["dec"][i], cfg, train
        )

    # --- dec0 in the phase domain
    up0, dec0, head = params["up"][-1], params["dec"][-1], params["head"]
    upw = phase_up_kernel(up0["w"]).astype(cfg.compute_dtype)
    up = jnp.einsum(
        "nhwc,cd->nhwd", xmid.astype(cfg.compute_dtype), upw,
        preferred_element_type=jnp.float32,
    ) + _tile4(up0["b"])
    cat = jnp.concatenate(
        [e0.reshape(n, h, w, 4, f0), up.reshape(n, h, w, 4, f0)], axis=-1
    ).reshape(n, h, w, 4 * 2 * f0)
    d0, new_state["dec"][-1] = _phase_block_apply(
        cat, params["dec"][-1], state["dec"][-1], cfg, train
    )

    hw_ = head["w"][0, 0].astype(cfg.compute_dtype)
    k = hw_.shape[-1]
    logits_p = jnp.einsum(
        "nhwpc,ck->nhwpk",
        d0.reshape(n, h, w, 4, f0).astype(cfg.compute_dtype), hw_,
        preferred_element_type=jnp.float32,
    ) + head["b"]
    logits = unet._depth_to_space(logits_p.reshape(n, h, w, 4 * k), 2)
    return logits.astype(jnp.float32), new_state


# ---------------------------------------------------------------------------
# volumetric (dims=3) polyphase: phase factor (1, 2, 2) — H, W only
# ---------------------------------------------------------------------------


def eligible3d(cfg: unet.UNetConfig, spatial: Tuple[int, ...]) -> bool:
    """True when the volumetric polyphase forward covers this serving
    config: 3D, transposed-conv upsampling, folded/absent norm, even
    H and W (z is never phased — microscopy stacks are z-thin and the
    z-pooling multiple already constrains it)."""
    return (
        cfg.dims == 3
        and cfg.depth >= 2  # level 0's pool/up/skip/dec structure
        and cfg.upsample == "transpose"
        and cfg.norm == "none"
        and len(spatial) == 3
        and all(s % 2 == 0 for s in spatial[1:])
    )


def _space_to_depth_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(N, Z, H, W, C) -> (N, Z, H/2, W/2, 4C), phase-major channels
    (the 2D ``unet._space_to_depth`` layout applied to the trailing
    spatial axes only)."""
    n, z, h, w, c = x.shape
    x = x.reshape(n, z, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        n, z, h // 2, w // 2, 4 * c
    )


def _depth_to_space_hw(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_space_to_depth_hw`."""
    n, z, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, z, h, w, 2, 2, c)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(n, z, 2 * h, 2 * w, c)


def phase_kernel3d(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, C_in, C_out) -> (3, 3, 3, 4C_in, 4C_out): the 2D phase
    rearrangement on the (H, W) tap axes; z taps pass through."""
    if w.shape[:3] != (3, 3, 3):
        raise ValueError(f"phase_kernel3d expects a 3x3x3 kernel, got {w.shape}")
    zero = jnp.zeros_like(w[0, 0, 0])
    rows = []
    for sy in (-1, 0, 1):
        cols = []
        for sx in (-1, 0, 1):
            in_blocks = []
            for p in (0, 1):
                for q in (0, 1):
                    out_blocks = []
                    for a in (0, 1):
                        for b in (0, 1):
                            dy = 2 * sy + p - a
                            dx = 2 * sx + q - b
                            ok = dy in (-1, 0, 1) and dx in (-1, 0, 1)
                            out_blocks.append(
                                w[:, dy + 1, dx + 1] if ok
                                else jnp.broadcast_to(
                                    zero, (3,) + zero.shape
                                )
                            )
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=-2))
        rows.append(jnp.stack(cols, axis=1))  # (z, sx, 4Cin, 4Cout)
    # stacking sy at axis 1 lands the (dz, sy, sx, I, O) = DHWIO layout
    return jnp.stack(rows, axis=1)


def phase_up_kernel3d(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(2, 2, 2, C_in, C_out) stride-2 transposed kernel -> two
    (C_in, 4C_out) 1x1 maps, one per output z-parity: kernel-2 stride-2
    has no tap overlap, so y[2z+az, 2i+a, 2j+b, o] = w[az, a, b, c, o]
    . x[z, i, j, c] — each z-parity emits all four (H, W) phases from
    one matmul, and the two parities interleave along z."""
    if w.shape[:3] != (2, 2, 2):
        raise ValueError(
            f"phase_up_kernel3d expects a 2x2x2 kernel, got {w.shape}"
        )
    outs = []
    for az in (0, 1):
        outs.append(jnp.concatenate(
            [w[az, a, b] for a in (0, 1) for b in (0, 1)], axis=-1
        ))
    return outs[0], outs[1]


def _phase_conv3d(x, w, b, cfg: unet.UNetConfig):
    """3x3x3 phase conv + bias, numerics mirroring ``unet._conv``."""
    y = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype),
        w.astype(cfg.compute_dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=unet._conv_dim_numbers(3),
        preferred_element_type=(
            jnp.float32 if cfg.compute_dtype == jnp.float32 else None
        ),
    )
    return y.astype(jnp.float32) + b


@jax.custom_vjp
def _phase_max_hw(e: jnp.ndarray) -> jnp.ndarray:
    """max over the (H, W) phase axis of (N, Z, h, w, 4, C) — the hw
    half of the 2x2x2 pool; first-tie backward like ``_phase_max``."""
    return jnp.max(e, axis=4)


def _phase_max_hw_fwd(e):
    m = jnp.max(e, axis=4)
    return m, (e, m)


def _phase_max_hw_bwd(res, g):
    e, m = res
    is_max = e == m[:, :, :, :, None, :]
    first = jnp.cumsum(is_max.astype(jnp.int32), axis=4) == 1
    return (jnp.where(is_max & first, g[:, :, :, :, None, :], 0.0),)


_phase_max_hw.defvjp(_phase_max_hw_fwd, _phase_max_hw_bwd)


def apply3d(
    cfg: unet.UNetConfig,
    params: unet.Params,
    state: unet.State,
    x: jnp.ndarray,
    train: bool = False,
) -> jnp.ndarray:
    """Volumetric serving forward equal to ``unet.apply(...)[0]`` with
    level 0 in the (1, 2, 2) polyphase domain — z is never phased
    (stacks are z-thin; the z extent of the full 2x2x2 pool is handled
    by a plain stride-2 z reduce after the phase max, which reproduces
    the window's row-major tie order exactly). ``x``: (N, Z, H, W, C),
    H and W even.
    """
    if train:
        raise ValueError("polyphase.apply3d is a serving-only forward")
    if not eligible3d(cfg, x.shape[1:-1]):
        raise ValueError(
            "polyphase.apply3d requires a folded 3D transpose-upsample "
            f"config with even H, W; got {cfg} on {x.shape}"
        )
    relu = jax.nn.relu
    enc0, dec0 = params["enc"][0], params["dec"][-1]
    up0, head = params["up"][-1], params["head"]

    xp = _space_to_depth_hw(x.astype(jnp.float32))
    e0 = relu(_phase_conv3d(
        xp, phase_kernel3d(enc0["conv1"]["w"]), _tile4(enc0["conv1"]["b"]),
        cfg,
    ))
    e0 = relu(_phase_conv3d(
        e0, phase_kernel3d(enc0["conv2"]["w"]), _tile4(enc0["conv2"]["b"]),
        cfg,
    ))

    n, z, h, w, c4 = e0.shape
    f0 = c4 // 4
    hw_pooled = _phase_max_hw(e0.reshape(n, z, h, w, 4, f0))
    # z half of the 2x2x2 pool: plain stride-2 window max over z
    xmid = jax.lax.reduce_window(
        hw_pooled, -jnp.inf, jax.lax.max,
        (1, 2, 1, 1, 1), (1, 2, 1, 1, 1), "VALID",
    )

    skips = []
    for lvl in range(1, cfg.depth):
        if lvl > 1:
            xmid = unet._maxpool(xmid, cfg)
        xmid, _ = unet._block_apply(
            xmid, params["enc"][lvl], state["enc"][lvl], cfg, False
        )
        if lvl < cfg.depth - 1:
            skips.append(xmid)
    for i, lvl in enumerate(reversed(range(1, cfg.depth - 1))):
        skip = skips[lvl - 1]
        xmid = unet._upsample(xmid, params["up"][i], skip.shape, cfg)
        xmid = jnp.concatenate([skip, xmid.astype(skip.dtype)], axis=-1)
        xmid, _ = unet._block_apply(
            xmid, params["dec"][i], state["dec"][i], cfg, False
        )

    # up-conv: two z-parity 1x1 maps, interleaved along z
    w_even, w_odd = phase_up_kernel3d(up0["w"])
    xm = xmid.astype(cfg.compute_dtype)
    u0 = jnp.einsum(
        "nzhwc,cd->nzhwd", xm, w_even.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    u1 = jnp.einsum(
        "nzhwc,cd->nzhwd", xm, w_odd.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    z2 = xmid.shape[1]
    up = jnp.stack([u0, u1], axis=2).reshape(
        n, 2 * z2, h, w, 4 * f0
    ) + _tile4(up0["b"])

    cat = jnp.concatenate(
        [e0.reshape(n, z, h, w, 4, f0), up.reshape(n, z, h, w, 4, f0)],
        axis=-1,
    ).reshape(n, z, h, w, 4 * 2 * f0)

    d0 = relu(_phase_conv3d(
        cat, phase_kernel3d(dec0["conv1"]["w"]), _tile4(dec0["conv1"]["b"]),
        cfg,
    ))
    d0 = relu(_phase_conv3d(
        d0, phase_kernel3d(dec0["conv2"]["w"]), _tile4(dec0["conv2"]["b"]),
        cfg,
    ))

    hw_ = head["w"][0, 0, 0].astype(cfg.compute_dtype)
    k = hw_.shape[-1]
    logits_p = jnp.einsum(
        "nzhwpc,ck->nzhwpk",
        d0.reshape(n, z, h, w, 4, f0).astype(cfg.compute_dtype), hw_,
        preferred_element_type=jnp.float32,
    ) + head["b"]
    logits = _depth_to_space_hw(logits_p.reshape(n, z, h, w, 4 * k))
    return logits.astype(jnp.float32)


def _phase_batch_norm3d(y, p, s, cfg: unet.UNetConfig, train: bool):
    """Volumetric BN on a (N, Z, h, w, 4C) phase activation with
    full-resolution semantics (cf. ``_phase_batch_norm``): reducing over
    (N, Z, h, w, phase) per channel is the same pixel multiset as the
    full-res (N, Z, H, W) reduction."""
    n, z, h, w, c4 = y.shape
    c = c4 // 4
    y32 = y.astype(jnp.float32).reshape(n, z, h, w, 4, c)
    if train:
        mean = jnp.mean(y32, axis=(0, 1, 2, 3, 4))
        var = jnp.var(y32, axis=(0, 1, 2, 3, 4))
        m = cfg.bn_momentum
        new_s = {
            "mean": m * s["mean"] + (1 - m) * mean,
            "var": m * s["var"] + (1 - m) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + cfg.bn_eps)
    out = (y32 - mean) * inv * p["scale"] + p["bias"]
    return out.reshape(n, z, h, w, c4), new_s


def _phase_block_apply3d(xp, p, s, cfg: unet.UNetConfig, train: bool):
    """conv -> norm -> relu, twice, in the volumetric phase domain."""
    new_s = {}
    for i in (1, 2):
        conv = p[f"conv{i}"]
        xp = _phase_conv3d(
            xp, phase_kernel3d(conv["w"]), _tile4(conv["b"]), cfg
        )
        if cfg.norm == "batch":
            xp, new_s[f"bn{i}"] = _phase_batch_norm3d(
                xp, p[f"bn{i}"], s[f"bn{i}"], cfg, train
            )
        xp = jax.nn.relu(xp)
    return xp, new_s


def apply3d_train(
    cfg: unet.UNetConfig,
    params: unet.Params,
    state: unet.State,
    x: jnp.ndarray,
    train: bool = True,
) -> Tuple[jnp.ndarray, unet.State]:
    """Volumetric training forward equal to ``unet.apply`` with level 0
    in the (1, 2, 2) phase domain — logits, BN statistics AND gradients
    match the production step (the pool decomposes into the first-tie
    (H, W) phase max then the z-stage ``reduce_window``, whose composed
    tie routing reproduces the 2x2x2 window's row-major order)."""
    if cfg.dims != 3 or cfg.depth < 2 or cfg.upsample != "transpose":
        raise ValueError(
            "polyphase.apply3d_train covers 3D transpose-upsample models "
            f"of depth >= 2; got dims={cfg.dims} depth={cfg.depth} "
            f"upsample={cfg.upsample!r}"
        )
    if any(d % 2 for d in x.shape[2:-1]):
        raise ValueError(f"even H/W required, got {x.shape}")
    new_state: unet.State = {"enc": [None] * cfg.depth,
                             "dec": [None] * (cfg.depth - 1)}

    xp = _space_to_depth_hw(x.astype(jnp.float32))
    e0, new_state["enc"][0] = _phase_block_apply3d(
        xp, params["enc"][0], state["enc"][0], cfg, train
    )
    n, z, h, w, c4 = e0.shape
    f0 = c4 // 4
    hw_pooled = _phase_max_hw(e0.reshape(n, z, h, w, 4, f0))
    xmid = jax.lax.reduce_window(
        hw_pooled, -jnp.inf, jax.lax.max,
        (1, 2, 1, 1, 1), (1, 2, 1, 1, 1), "VALID",
    )

    skips = []
    for lvl in range(1, cfg.depth):
        if lvl > 1:
            xmid = unet._maxpool(xmid, cfg)
        xmid, new_state["enc"][lvl] = unet._block_apply(
            xmid, params["enc"][lvl], state["enc"][lvl], cfg, train
        )
        if lvl < cfg.depth - 1:
            skips.append(xmid)
    for i, lvl in enumerate(reversed(range(1, cfg.depth - 1))):
        skip = skips[lvl - 1]
        xmid = unet._upsample(xmid, params["up"][i], skip.shape, cfg)
        xmid = jnp.concatenate([skip, xmid.astype(skip.dtype)], axis=-1)
        xmid, new_state["dec"][i] = unet._block_apply(
            xmid, params["dec"][i], state["dec"][i], cfg, train
        )

    up0, head = params["up"][-1], params["head"]
    w_even, w_odd = phase_up_kernel3d(up0["w"])
    xm = xmid.astype(cfg.compute_dtype)
    u0 = jnp.einsum(
        "nzhwc,cd->nzhwd", xm, w_even.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    u1 = jnp.einsum(
        "nzhwc,cd->nzhwd", xm, w_odd.astype(cfg.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    z2 = xmid.shape[1]
    up = jnp.stack([u0, u1], axis=2).reshape(
        n, 2 * z2, h, w, 4 * f0
    ) + _tile4(up0["b"])
    cat = jnp.concatenate(
        [e0.reshape(n, z, h, w, 4, f0), up.reshape(n, z, h, w, 4, f0)],
        axis=-1,
    ).reshape(n, z, h, w, 4 * 2 * f0)
    d0, new_state["dec"][-1] = _phase_block_apply3d(
        cat, params["dec"][-1], state["dec"][-1], cfg, train
    )

    hw_ = head["w"][0, 0, 0].astype(cfg.compute_dtype)
    k = hw_.shape[-1]
    logits_p = jnp.einsum(
        "nzhwpc,ck->nzhwpk",
        d0.reshape(n, z, h, w, 4, f0).astype(cfg.compute_dtype), hw_,
        preferred_element_type=jnp.float32,
    ) + head["b"]
    logits = _depth_to_space_hw(logits_p.reshape(n, z, h, w, 4 * k))
    return logits.astype(jnp.float32), new_state
