"""2D/3D U-Net for cell segmentation — shared functional core.

sequitr's workhorse networks are a 2D fully-convolutional U-Net for
multi-class cell segmentation (e.g. background/interphase/mitotic) and a 3D
volumetric variant over z-stacks (SURVEY.md §2 'UNet2D'/'UNet3D';
BASELINE.json configs #1-#4). Reference source unavailable — the topology
below is the classic Ronneberger encoder/decoder with skip connections,
SAME padding (so output size == input size), two 3x3 convs + norm + ReLU
per level, 2x max-pool downsampling, learned 2x transposed-conv upsampling
and a 1x1-conv softmax head; every choice is a documented spec decision.

TPU-first design notes
----------------------
* NHWC / NDHWC layout (channels-last) — the native TPU conv layout; all
  convs lower to MXU matmuls via XLA.
* Mixed precision: inputs/weights are cast to ``cfg.compute_dtype``
  (bfloat16 by default on TPU) while conv accumulation is forced to float32
  via ``preferred_element_type`` — MXU-native and within the per-pixel
  fidelity bar (normalization layers always run float32).
* Pure functional: parameters and (batch-norm) state are plain pytrees, the
  forward is a pure function of them — trivially jit/grad/vmap/shard-able.
* Feature widths double per level, capped by ``features_cap`` to bound HBM
  for the 3D variant.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]

__all__ = ["UNetConfig", "init", "apply", "param_count"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """U-Net architecture configuration (2D when ``dims``==2, 3D when 3)."""

    in_channels: int = 1
    num_classes: int = 3
    depth: int = 4  # encoder levels incl. bottleneck (depth-1 poolings)
    base_features: int = 32
    features_cap: int = 512
    dims: int = 2
    norm: str = "batch"  # "batch" | "none"
    upsample: str = "transpose"  # "transpose" | "resize"
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    # space-to-depth factor (2D only). s>1 runs the net at (H/s, W/s) with
    # s^2 x input channels and an s^2 x num_classes head rearranged back to
    # full resolution — externally identical I/O, internally wider channels
    # for better MXU utilization (the round-1 conv study's conclusion that
    # thin channels bound throughput; BASELINE.md). A DIFFERENT model from
    # s=1: weights are not interchangeable and it must be trained as such.
    space_to_depth: int = 1

    def features(self, level: int) -> int:
        return min(self.base_features * (2**level), self.features_cap)

    @property
    def min_input_multiple(self) -> int:
        """Spatial size must be divisible by this (pool factor x s2d)."""
        return self.space_to_depth * 2 ** (self.depth - 1)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def _conv_dim_numbers(dims: int) -> jax.lax.ConvDimensionNumbers:
    if dims == 2:
        return jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )
    return jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
    )


def _he_init(key, shape, fan_in, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_in)


def _init_conv(key, k, c_in, c_out, dims) -> Params:
    shape = (k,) * dims + (c_in, c_out)
    fan_in = (k**dims) * c_in
    return {
        "w": _he_init(key, shape, fan_in),
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _init_norm(c: int) -> Params:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _init_norm_state(c: int) -> State:
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def _preferred(cfg: UNetConfig):
    """Accumulation dtype exposed by convs.

    f32 compute: expose f32 (exact parity path). bf16 compute: let the conv
    output bf16 (MXU still accumulates f32 internally) and upcast through an
    explicit astype — keeping primal and cotangent dtypes consistent so the
    conv transpose rules differentiate cleanly under mixed precision.
    """
    return jnp.float32 if cfg.compute_dtype == jnp.float32 else None


def _conv(x, p, cfg: UNetConfig, stride: int = 1, padding="SAME"):
    dn = _conv_dim_numbers(cfg.dims)
    w = p["w"].astype(cfg.compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(cfg.compute_dtype),
        w,
        window_strides=(stride,) * cfg.dims,
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=_preferred(cfg),
    )
    return y.astype(jnp.float32) + p["b"]


def _conv_transpose(x, p, cfg: UNetConfig):
    """Learned 2x upsampling: kernel-2 stride-2 transposed conv (exact 2x).

    ``transpose_kernel=True`` (with the kernel's channel axes swapped at
    apply time) reproduces TF ``conv2d_transpose`` semantics bit-for-bit —
    required for weight-level parity with the TF reference (verified in
    tests/test_parity.py). Stored layout stays (k..., c_in, c_out).
    """
    dn = ("NHWC", "HWIO", "NHWC") if cfg.dims == 2 else ("NDHWC", "DHWIO", "NDHWC")
    w = jnp.swapaxes(p["w"].astype(cfg.compute_dtype), -1, -2)
    y = jax.lax.conv_transpose(
        x.astype(cfg.compute_dtype),
        w,
        strides=(2,) * cfg.dims,
        padding="VALID",
        dimension_numbers=dn,
        transpose_kernel=True,
        preferred_element_type=_preferred(cfg),
    )
    return y.astype(jnp.float32) + p["b"]


def _batch_norm(x, p, s, cfg: UNetConfig, train: bool):
    """BatchNorm over all but the channel axis; returns (y, new_state)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        m = cfg.bn_momentum
        new_s = {
            "mean": m * s["mean"] + (1 - m) * mean,
            "var": m * s["var"] + (1 - m) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + cfg.bn_eps)
    y = (x32 - mean) * inv * p["scale"] + p["bias"]
    return y, new_s


def _block_apply(x, p, s, cfg: UNetConfig, train: bool):
    """conv -> norm -> relu, twice. Returns (y, new_state)."""
    new_s = {}
    for i in (1, 2):
        x = _conv(x, p[f"conv{i}"], cfg)
        if cfg.norm == "batch":
            x, new_s[f"bn{i}"] = _batch_norm(x, p[f"bn{i}"], s[f"bn{i}"], cfg, train)
        x = jax.nn.relu(x)
    return x, new_s


def _init_block(key, c_in, c_out, cfg: UNetConfig) -> Tuple[Params, State]:
    k1, k2 = jax.random.split(key)
    p: Params = {
        "conv1": _init_conv(k1, 3, c_in, c_out, cfg.dims),
        "conv2": _init_conv(k2, 3, c_out, c_out, cfg.dims),
    }
    s: State = {}
    if cfg.norm == "batch":
        p["bn1"], p["bn2"] = _init_norm(c_out), _init_norm(c_out)
        s["bn1"], s["bn2"] = _init_norm_state(c_out), _init_norm_state(c_out)
    return p, s


def _maxpool(x, cfg: UNetConfig):
    dims = cfg.dims
    window = (1,) + (2,) * dims + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, window, "VALID"
    )


def _upsample(x, p, skip_shape, cfg: UNetConfig):
    if cfg.upsample == "transpose":
        return _conv_transpose(x, p, cfg)
    # resize + 1x1 conv
    new_spatial = skip_shape[1:-1]
    y = jax.image.resize(
        x.astype(jnp.float32),
        x.shape[:1] + tuple(new_spatial) + x.shape[-1:],
        method="nearest",
    )
    return _conv(y, p, cfg)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: UNetConfig) -> Tuple[Params, State]:
    """Initialize (params, state) pytrees for the given config."""
    params: Params = {"enc": [], "dec": [], "up": []}
    state: State = {"enc": [], "dec": []}
    keys = jax.random.split(key, 3 * cfg.depth + 1)
    ki = iter(keys)

    s2d = cfg.space_to_depth
    if s2d > 1 and cfg.dims != 2:
        raise ValueError("space_to_depth is 2D-only")
    c_prev = cfg.in_channels * s2d * s2d
    for lvl in range(cfg.depth):
        c = cfg.features(lvl)
        p, s = _init_block(next(ki), c_prev, c, cfg)
        params["enc"].append(p)
        state["enc"].append(s)
        c_prev = c

    for lvl in reversed(range(cfg.depth - 1)):
        c_skip = cfg.features(lvl)
        c_in = c_prev
        if cfg.upsample == "transpose":
            up = _init_conv(next(ki), 2, c_in, c_skip, cfg.dims)
        else:
            up = _init_conv(next(ki), 1, c_in, c_skip, cfg.dims)
        params["up"].append(up)
        p, s = _init_block(next(ki), c_skip * 2, c_skip, cfg)
        params["dec"].append(p)
        state["dec"].append(s)
        c_prev = c_skip

    params["head"] = _init_conv(
        next(ki), 1, c_prev, cfg.num_classes * s2d * s2d, cfg.dims
    )
    return params, state


def _space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/s, W/s, C*s*s)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // s, w // s, s * s * c)


def _depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, h, w, C*s*s) -> (N, h*s, w*s, C) — inverse of _space_to_depth."""
    n, h, w, cs = x.shape
    c = cs // (s * s)
    x = x.reshape(n, h, w, s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * s, w * s, c)


def apply(
    cfg: UNetConfig,
    params: Params,
    state: State,
    x: jnp.ndarray,
    train: bool = False,
) -> Tuple[jnp.ndarray, State]:
    """Forward pass. ``x``: (N, *spatial, C_in). Returns (logits, new_state).

    Logits are float32 (N, *spatial, num_classes); spatial dims must be
    divisible by ``cfg.min_input_multiple``.
    """
    for d in x.shape[1:-1]:
        if d % cfg.min_input_multiple:
            raise ValueError(
                f"spatial dim {d} not divisible by {cfg.min_input_multiple}"
            )
    s2d = cfg.space_to_depth
    if s2d > 1:
        x = _space_to_depth(x, s2d)
    new_state: State = {"enc": [], "dec": []}
    skips = []
    for lvl in range(cfg.depth):
        if lvl > 0:
            x = _maxpool(x, cfg)
        x, s = _block_apply(x, params["enc"][lvl], state["enc"][lvl], cfg, train)
        new_state["enc"].append(s)
        if lvl < cfg.depth - 1:
            skips.append(x)

    for i, lvl in enumerate(reversed(range(cfg.depth - 1))):
        skip = skips[lvl]
        x = _upsample(x, params["up"][i], skip.shape, cfg)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        x, s = _block_apply(x, params["dec"][i], state["dec"][i], cfg, train)
        new_state["dec"].append(s)

    logits = _conv(x, params["head"], cfg)
    if s2d > 1:
        logits = _depth_to_space(logits, s2d)
    return logits.astype(jnp.float32), new_state


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def fold_batchnorm(
    cfg: UNetConfig, params: Params, state: State
) -> Tuple[UNetConfig, Params, State]:
    """Fold inference-mode batch norm into the preceding conv weights.

    BN(conv(x; w, b)) == conv(x; w*g, (b-mean)*g + beta) with
    g = scale / sqrt(var + eps) broadcast over the output-channel axis —
    numerically identical at inference, and it removes every BN elementwise
    pass (and its float32 activation materialization) from the hot path.
    Returns an equivalent ``norm='none'`` (cfg, params, state) triple.
    """
    if cfg.norm != "batch":
        return cfg, params, state

    def fold_block(bp: Params, bs: State) -> Params:
        out = {}
        for i in (1, 2):
            conv = bp[f"conv{i}"]
            bn, sn = bp[f"bn{i}"], bs[f"bn{i}"]
            g = bn["scale"] * jax.lax.rsqrt(sn["var"] + cfg.bn_eps)
            out[f"conv{i}"] = {
                "w": conv["w"] * g,  # broadcasts over trailing O axis
                "b": (conv["b"] - sn["mean"]) * g + bn["bias"],
            }
        return out

    folded: Params = {
        "enc": [fold_block(p, s) for p, s in zip(params["enc"], state["enc"])],
        "dec": [fold_block(p, s) for p, s in zip(params["dec"], state["dec"])],
        "up": [dict(p) for p in params["up"]],
        "head": dict(params["head"]),
    }
    folded_cfg = dataclasses.replace(cfg, norm="none")
    return folded_cfg, folded, {"enc": [{} for _ in params["enc"]], "dec": [{} for _ in params["dec"]]}
