"""int8 conv throughput at the U-Net's exact shapes — the quantization case.

The round-4 whole-graph roofline (BASELINE.md) shows the 1024² parity
graph spends 13.5 of its 16 ms in the two THIN full-res levels (enc0
4.9 ms @ 4.1 TFLOP/s, dec0 8.6 ms @ 7.2 TFLOP/s): 32-channel convs feed a
quarter of the 128-wide MXU and no data-movement trick lifts that ceiling
(the round-1 conv studies and the parked Winograd both measured it). The
remaining lever the hardware offers is ARITHMETIC WIDTH: the v5e MXU runs
int8 × int8 → int32 at 2× its bf16 rate, and int8 activations halve the
HBM traffic of every boundary the fusion doesn't eliminate.

This study measures, per production conv shape (from the roofline table):

* bf16 conv (f32 accumulate) — the current serving kernel, the baseline;
* raw int8 conv (``preferred_element_type=int32``) — the MXU ceiling;
* a REALISTIC quantized layer: int8 conv → int32 → per-channel f32
  rescale + bias + relu → requantize to int8 (what a PTQ serving path
  actually runs, including the requant elementwise tail XLA must fuse).

Timing uses the roofline's scan-amortized methodology (per-call dispatch
through this machine's relay tunnel is ~ms — far above the kernels).

Run on the chip:  python -m sequitr_tpu.studies.int8_conv [--iters 32]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

__all__ = ["run", "SHAPES"]

# (label, spatial, cin, cout) — the parity graph's conv population by level
# (roofline table, BASELINE.md round 4)
SHAPES = [
    ("enc0a 1024² 1→32", (1024, 1024), 1, 32),
    ("enc0b 1024² 32→32", (1024, 1024), 32, 32),
    ("dec0a 1024² 64→32", (1024, 1024), 64, 32),
    ("enc1 512² 64→64", (512, 512), 64, 64),
    ("dec1 512² 128→64", (512, 512), 128, 64),
    ("enc2 256² 128→128", (256, 256), 128, 128),
    ("enc3 128² 256→256", (128, 128), 256, 256),
]


def _rate_scan(fn, args, iters: int) -> float:
    """Per-iteration seconds, dispatch amortized — the roofline's harness.

    One shared implementation (roofline._rate_scan) so a methodology fix
    there applies to any future int8 re-measurement here. Its float
    carry-perturbation casts to the input dtype, which preserves the
    loop-carried data dependence for int8 inputs too (the carry is a
    traced runtime value; XLA cannot hoist the add even when it rounds
    to zero).
    """
    from sequitr_tpu.studies.roofline import _rate_scan as rate_scan

    return rate_scan(fn, args, iters)


def _conv(x, w, out_dtype):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def run(iters: int = 32):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows = []
    for label, spatial, cin, cout in SHAPES:
        h, w = spatial
        flops = 2.0 * 9 * cin * cout * h * w
        xf = rng.normal(size=(1, h, w, cin)).astype(np.float32)
        wf = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
        bf = rng.normal(size=(cout,)).astype(np.float32) * 0.01

        # bf16 baseline (f32 accumulate — the production serving conv)
        xb = jnp.asarray(xf, jnp.bfloat16)
        wb = jnp.asarray(wf, jnp.bfloat16)
        t_bf16 = _rate_scan(
            lambda x, w_: _conv(x, w_, jnp.float32), (xb, wb), iters
        )

        # raw int8 conv → int32 (the MXU ceiling for the quantized path)
        xi = jnp.asarray(
            np.clip(np.round(xf * 30), -127, 127).astype(np.int8)
        )
        wi = jnp.asarray(
            np.clip(np.round(wf * 300), -127, 127).astype(np.int8)
        )
        t_int8 = _rate_scan(
            lambda x, w_: _conv(x, w_, jnp.int32), (xi, wi), iters
        )

        # realistic PTQ layer: int8 conv → per-channel rescale + bias +
        # relu → requantize to int8 for the next layer
        scale = jnp.asarray(
            rng.uniform(1e-4, 1e-3, (cout,)).astype(np.float32)
        )
        bias = jnp.asarray(bf)
        inv_next = jnp.float32(25.0)

        def ptq_layer(x, w_, s, b):
            acc = _conv(x, w_, jnp.int32)
            y = acc.astype(jnp.float32) * s + b
            y = jax.nn.relu(y)
            q = jnp.clip(jnp.round(y * inv_next), -127, 127)
            return q.astype(jnp.int8)

        t_ptq = _rate_scan(ptq_layer, (xi, wi, scale, bias), iters)

        row = {
            "shape": label,
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "int8_ms": round(t_int8 * 1e3, 3),
            "ptq_layer_ms": round(t_ptq * 1e3, 3),
            "bf16_tflops": round(flops / t_bf16 / 1e12, 2),
            "int8_tops": round(flops / t_int8 / 1e12, 2),
            "speedup_raw": round(t_bf16 / t_int8, 2),
            "speedup_ptq": round(t_bf16 / t_ptq, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| shape | bf16 ms | int8 ms | ptq ms | raw× | ptq× |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['shape']} | {r['bf16_ms']} | {r['int8_ms']} | "
            f"{r['ptq_layer_ms']} | {r['speedup_raw']} | {r['speedup_ptq']} |"
        )
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    run(iters=args.iters)
