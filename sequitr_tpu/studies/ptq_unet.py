"""Post-training int8 quantization (PTQ) for the U-Net — full recipe.

STATUS — EXPERIMENTAL, PARKED (measured v5e, 2026-08-17): int8 convs are
NOT faster through XLA on this chip. ``studies/int8_conv.py`` (scan-
amortized, per production conv shape) measured raw int8 conv at 1.00-1.04x
bf16 on the thin 1024² levels and 0.60-0.73x on the deeper levels, and
the realistic PTQ layer (conv + rescale/bias/relu/requant epilogue) at
0.22-0.81x — the epilogue does not fuse into the conv and the int8 conv
lowering never reaches the MXU's 2x int8 rate. With zero speedup and a
fidelity cost, quantized serving would be strictly worse than the bf16
path, so the registry/server integration was not built. Kept here (with a
numerics test in tests/test_studies.py) as the measured negative result +
a complete, correct PTQ implementation should a future XLA/Mosaic release
open the int8 conv path — re-run ``studies/int8_conv.py`` first.

Why this was attempted: the round-4 whole-graph roofline (BASELINE.md)
put 13.5 of the 1024² parity graph's 16 ms in the two THIN full-res
levels, pinned at the ~8 TFLOP/s practical bf16 ceiling for 32-channel
convs; every data-movement and arithmetic-identity trick (Pallas GEMM
forms, Winograd) was already measured and parked, leaving arithmetic
width as the one untried hardware lever.

Scheme — the standard production PTQ recipe:

* weights: symmetric per-output-channel int8
  (``scale_c = max|w[..., c]| / 127``), computed from the BN-FOLDED
  weights so the quantization sees exactly what serving runs;
* activations: symmetric per-tensor int8 with STATIC scales from offline
  calibration (a high quantile of |x| at every conv input over
  representative normalized patches) — static scales keep the serving
  graph shape-static, no on-line amax reductions;
* accumulation in int32 (``preferred_element_type``), dequantized once
  per conv with the folded ``x_scale * w_scale`` product, bias and ReLU
  applied in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sequitr_tpu.models import unet

Params = Dict[str, Any]

__all__ = ["quantize", "apply", "template", "calibrate", "QMIN", "QMAX"]

QMAX = 127.0
QMIN = -127.0  # symmetric: -128 is never produced


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _quantize_tensor(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """float32 -> int8 with a (scalar) scale: q = clip(round(x / s))."""
    q = jnp.clip(jnp.round(x * (1.0 / scale)), QMIN, QMAX)
    return q.astype(jnp.int8)


def _quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: returns (w_q, scale[c_out])."""
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=axes)
    scale = jnp.maximum(amax / QMAX, 1e-12).astype(jnp.float32)
    w_q = jnp.clip(jnp.round(w / scale), QMIN, QMAX).astype(jnp.int8)
    return w_q, scale


def _qconv(x: jnp.ndarray, qc: Params, cfg: unet.UNetConfig,
           transpose: bool = False) -> jnp.ndarray:
    """Quantize -> int8 conv (int32 accumulate) -> dequant + bias, float32.

    ``x`` is the float32 activation; the quantize lowers to a VPU
    round/clip XLA fuses into the previous layer's epilogue, and the conv
    itself runs int8 on the MXU.
    """
    xq = _quantize_tensor(x, qc["x_s"])
    if transpose:
        dn = (
            ("NHWC", "HWIO", "NHWC") if cfg.dims == 2
            else ("NDHWC", "DHWIO", "NDHWC")
        )
        acc = jax.lax.conv_transpose(
            xq, jnp.swapaxes(qc["w_q"], -1, -2),
            strides=(2,) * cfg.dims, padding="VALID",
            dimension_numbers=dn, transpose_kernel=True,
            preferred_element_type=jnp.int32,
        )
    else:
        dn = unet._conv_dim_numbers(cfg.dims)
        acc = jax.lax.conv_general_dilated(
            xq, qc["w_q"], window_strides=(1,) * cfg.dims, padding="SAME",
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
    return acc.astype(jnp.float32) * (qc["x_s"] * qc["w_s"]) + qc["b"]


def _q_block(x, bp: Params, cfg: unet.UNetConfig):
    for i in (1, 2):
        x = jax.nn.relu(_qconv(x, bp[f"conv{i}"], cfg))
    return x


def _q_upsample(x, qc: Params, skip_shape, cfg: unet.UNetConfig):
    if cfg.upsample == "transpose":
        return _qconv(x, qc, cfg, transpose=True)
    y = jax.image.resize(
        x, x.shape[:1] + tuple(skip_shape[1:-1]) + x.shape[-1:],
        method="nearest",
    )
    return _qconv(y, qc, cfg)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def apply(cfg: unet.UNetConfig, qparams: Params, x: jnp.ndarray) -> jnp.ndarray:
    """int8 forward. ``x``: (N, *spatial, C_in) float. Returns f32 logits.

    Mirrors ``unet.apply`` (inference mode, BN already folded at
    quantization time) with every conv/transposed-conv running int8 on
    the MXU. Pools, concats and ReLUs stay on the float32 values between
    conv sites — semantically; XLA's fusion decides storage, and the
    round/clip quantize of each conv input folds into the producer's
    epilogue.
    """
    for d in x.shape[1:-1]:
        if d % cfg.min_input_multiple:
            raise ValueError(
                f"spatial dim {d} not divisible by {cfg.min_input_multiple}"
            )
    x = x.astype(jnp.float32)
    s2d = cfg.space_to_depth
    if s2d > 1:
        x = unet._space_to_depth(x, s2d)
    skips = []
    for lvl in range(cfg.depth):
        if lvl > 0:
            x = unet._maxpool(x, cfg)
        x = _q_block(x, qparams["enc"][lvl], cfg)
        if lvl < cfg.depth - 1:
            skips.append(x)
    for i, lvl in enumerate(reversed(range(cfg.depth - 1))):
        skip = skips[lvl]
        x = _q_upsample(x, qparams["up"][i], skip.shape, cfg)
        x = jnp.concatenate([skip, x], axis=-1)
        x = _q_block(x, qparams["dec"][i], cfg)
    logits = _qconv(x, qparams["head"], cfg)
    if s2d > 1:
        logits = unet._depth_to_space(logits, s2d)
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------


def _site_forward(cfg: unet.UNetConfig, params: Params, x: jnp.ndarray,
                  record) -> jnp.ndarray:
    """The folded f32 forward with a ``record(site, conv_input)`` hook at
    every conv site — the calibration twin of ``apply`` (site keys match
    the qparams layout exactly)."""
    x = x.astype(jnp.float32)
    s2d = cfg.space_to_depth
    if s2d > 1:
        x = unet._space_to_depth(x, s2d)

    f32cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)

    def block(x, bp, key):
        for i in (1, 2):
            record(f"{key}/conv{i}", x)
            x = jax.nn.relu(unet._conv(x, bp[f"conv{i}"], f32cfg))
        return x
    skips = []
    for lvl in range(cfg.depth):
        if lvl > 0:
            x = unet._maxpool(x, cfg)
        x = block(x, params["enc"][lvl], f"enc{lvl}")
        if lvl < cfg.depth - 1:
            skips.append(x)
    for i, lvl in enumerate(reversed(range(cfg.depth - 1))):
        skip = skips[lvl]
        record(f"up{i}", x)
        x = unet._upsample(x, params["up"][i], skip.shape, f32cfg)
        x = jnp.concatenate([skip, x], axis=-1)
        x = block(x, params["dec"][i], f"dec{i}")
    record("head", x)
    return unet._conv(x, params["head"], f32cfg)


def calibrate(
    cfg: unet.UNetConfig,
    params: Params,
    batches,
    quantile: float = 0.9999,
) -> Dict[str, float]:
    """Per-site activation scales from representative NORMALIZED patches.

    ``cfg``/``params`` must already be BN-folded (norm='none').
    ``batches``: iterable of (N, *patch, C_in) float arrays — feed the
    exact tensors serving will see (normalized, tiled). Per batch, each
    conv input's |x| quantile is measured; scales take the running max
    over batches (conservative: clipping hurts segmentation more than one
    extra bit of rounding noise). Returns {site: scale}.
    """
    q = float(quantile)

    @jax.jit
    def stats(x):
        out = {}

        def record(site, t):
            out[site] = jnp.quantile(
                jnp.abs(t).astype(jnp.float32).ravel(), q
            )

        _site_forward(cfg, params, x, record)
        return out

    scales: Dict[str, float] = {}
    n = 0
    for batch in batches:
        got = jax.device_get(stats(jnp.asarray(batch)))
        n += 1
        for site, amax in got.items():
            prev = scales.get(site, 0.0)
            scales[site] = max(prev, float(amax))
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return {site: max(a / QMAX, 1e-12) for site, a in scales.items()}


# ---------------------------------------------------------------------------
# quantization + registry plumbing
# ---------------------------------------------------------------------------


def _pack(conv: Params, x_scale: float) -> Params:
    w_q, w_s = _quantize_weight(jnp.asarray(conv["w"], jnp.float32))
    return {
        "w_q": w_q,
        "w_s": w_s,
        "b": jnp.asarray(conv["b"], jnp.float32),
        "x_s": jnp.float32(x_scale),
    }


def quantize(
    cfg: unet.UNetConfig,
    params: Params,
    state: Params,
    calib_batches,
    quantile: float = 0.9999,
) -> Tuple[unet.UNetConfig, Params]:
    """Fold BN, calibrate activation scales, quantize weights.

    Returns ``(qcfg, qparams)``: the folded (norm='none') config and the
    single quantized pytree (int8 weights, per-channel weight scales,
    per-site activation scales, float32 biases).
    """
    fcfg, fparams, _ = unet.fold_batchnorm(cfg, params, state)
    scales = calibrate(fcfg, fparams, calib_batches, quantile=quantile)
    qparams: Params = {
        "enc": [
            {
                "conv1": _pack(bp["conv1"], scales[f"enc{lvl}/conv1"]),
                "conv2": _pack(bp["conv2"], scales[f"enc{lvl}/conv2"]),
            }
            for lvl, bp in enumerate(fparams["enc"])
        ],
        "up": [
            _pack(p, scales[f"up{i}"]) for i, p in enumerate(fparams["up"])
        ],
        "dec": [
            {
                "conv1": _pack(bp["conv1"], scales[f"dec{i}/conv1"]),
                "conv2": _pack(bp["conv2"], scales[f"dec{i}/conv2"]),
            }
            for i, bp in enumerate(fparams["dec"])
        ],
        "head": _pack(fparams["head"], scales["head"]),
    }
    return fcfg, qparams


def template(cfg: unet.UNetConfig) -> Params:
    """Zeroed qparams pytree (structure + dtypes) for orbax restore."""
    base = dataclasses.replace(cfg, norm="none")
    params, _ = unet.init(jax.random.PRNGKey(0), base)

    def zpack(conv):
        w = conv["w"]
        return {
            "w_q": jnp.zeros(w.shape, jnp.int8),
            "w_s": jnp.ones((w.shape[-1],), jnp.float32),
            "b": jnp.zeros((w.shape[-1],), jnp.float32),
            "x_s": jnp.float32(1.0),
        }

    return {
        "enc": [
            {"conv1": zpack(bp["conv1"]), "conv2": zpack(bp["conv2"])}
            for bp in params["enc"]
        ],
        "up": [zpack(p) for p in params["up"]],
        "dec": [
            {"conv1": zpack(bp["conv1"]), "conv2": zpack(bp["conv2"])}
            for bp in params["dec"]
        ],
        "head": zpack(params["head"]),
    }
