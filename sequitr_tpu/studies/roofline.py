"""Whole-graph per-level roofline of the 1024² parity graph.

Round-4 verdict item 3: the claim "the north star runs at the measured
conv ceiling" was extrapolated from ONE thin-level conv study; this study
*shows* it (or shows what a level leaves on the table). It slices the
production folded bf16 inference graph into its pipeline stages — the
Pallas normalize, each encoder level (pool + two 3x3 convs), each decoder
level (2x2 transposed conv + concat + two 3x3 convs), and the head
(1x1 conv + softmax + argmax) — jits each stage separately, and times
them with per-call dispatch amortized under one ``lax.scan`` (see
``_rate_scan``; the fused whole-graph reference keeps bench.py's
per-dispatch methodology for comparability).

For every stage it reports:
* measured time per frame and analytic TFLOP (2*K^d*Cin*Cout*H*W per conv),
* achieved TFLOP/s,
* the stage's MEASURED ceiling: the summed isolated runtimes of its convs,
  timed alone at identical shapes/dtypes (so the "% of ceiling" column
  charges each level against what its own matmuls can do on this chip —
  not against an unreachable peak-MXU number),
* and the coverage check: sum of stage times vs the fused whole-graph
  time (the fused graph may beat the sum: XLA fuses across our slice
  boundaries; the table notes both).

Run on the chip (writes JSON lines + a markdown table to stdout):

    python -m sequitr_tpu.studies.roofline [--iters 24] [--size 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from typing import Dict

import numpy as np


def _rate(step, iters: int, warmup: int = 3) -> float:
    """Seconds per call, dependent-scalar-forced (honest through the relay).

    Used for the FUSED whole-graph reference only — matches bench.py's
    per-frame dispatch methodology.
    """
    import jax
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = step()
    float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _rate_scan(fn, args, iters: int) -> float:
    """Per-iteration seconds with dispatch amortized inside ONE jit.

    Individual stages run 0.1-10 ms — far below this machine's per-call
    relay dispatch latency — so timing them call-by-call measures the
    tunnel, not the kernel (the first run of this study clocked stage sums
    at 100x the fused graph). Instead the stage runs ``iters`` times under
    one ``lax.scan`` whose carry perturbs the input by ~1e-30x a scalar
    derived from the previous output: a true data dependence XLA cannot
    hoist out of the loop (multiply-by-carry is not foldable under float
    NaN semantics), at a numerically irrelevant cost.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(eps, args):
        def body(carry, _):
            a0 = args[0] + carry.astype(args[0].dtype)
            out = fn(a0, *args[1:])
            leaf = jax.tree.leaves(out)[-1]
            new_carry = (
                leaf.ravel()[0].astype(jnp.float32) * jnp.float32(1e-30)
            )
            return new_carry, ()
        c, _ = jax.lax.scan(body, eps, None, length=iters)
        return c

    float(run(jnp.float32(0.0), args))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0), args))
    return (time.perf_counter() - t0) / iters


def _conv_flops(k: int, cin: int, cout: int, spatial) -> float:
    return 2.0 * (k ** len(spatial)) * cin * cout * float(np.prod(spatial))


def run(size: int = 1024, iters: int = 24):
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.models import unet
    from sequitr_tpu.pipeline import infer as infer_lib

    cfg = unet.UNetConfig(
        in_channels=1, num_classes=3, depth=4, base_features=32,
        compute_dtype=jnp.bfloat16
        if jax.default_backend() == "tpu" else jnp.float32,
    )
    params, state = unet.init(jax.random.PRNGKey(0), cfg)
    fcfg, fparams, fstate = unet.fold_batchnorm(cfg, params, state)
    cdt = fcfg.compute_dtype

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.gamma(2.0, 100.0, (size, size)).astype(np.float32))
    tc = infer_lib.TileConfig(patch=(size, size), overlap=(0, 0))

    # ---- the real fused production graph (reference total) ----
    full = infer_lib.make_frame_inferrer(cfg, tc, (size, size))
    t_full = _rate(lambda: full(params, state, frame), iters)

    # ---- stage slices (same fns the model uses, timed via _rate_scan) ----
    feats = [fcfg.features(l) for l in range(fcfg.depth)]  # [32,64,128,256]

    def stage_norm(f):
        return infer_lib._normalize(f[..., None], tc)[None].astype(cdt)

    def block_stage(x, lvl_params):
        y, _ = unet._block_apply(x, lvl_params, {}, fcfg, False)
        return y

    def pool_block_stage(x, lvl_params):
        y, _ = unet._block_apply(
            unet._maxpool(x, fcfg), lvl_params, {}, fcfg, False
        )
        return y

    def dec_stage(x, skip, up_p, dec_p):
        y = unet._upsample(x, up_p, skip.shape, fcfg)
        y = jnp.concatenate([skip, y.astype(skip.dtype)], axis=-1)
        y, _ = unet._block_apply(y, dec_p, {}, fcfg, False)
        return y

    def stage_head(x):
        logits = unet._conv(x, fparams["head"], fcfg).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, jnp.argmax(logits, -1).astype(jnp.int32)

    # materialized inter-stage activations (device-resident, bf16)
    acts = {}
    x = jax.jit(stage_norm)(frame)
    acts["enc0_in"] = x
    x = jax.jit(block_stage)(x, fparams["enc"][0])
    acts["enc0"] = x
    for lvl in (1, 2, 3):
        x = jax.jit(pool_block_stage)(x, fparams["enc"][lvl])
        acts[f"enc{lvl}"] = x
    skips = [acts["enc0"], acts["enc1"], acts["enc2"]]
    for i, lvl in enumerate((2, 1, 0)):
        x = jax.jit(dec_stage)(x, skips[lvl], fparams["up"][i], fparams["dec"][i])
        acts[f"dec{lvl}"] = x

    # ---- isolated-conv ceilings (same scan-amortized methodology) ----
    # The ceiling is the RAW conv (bf16 in/out, no bias add, no f32
    # upcast): what the MXU can do for exactly this stage's matmuls. The
    # production `unet._conv` upcasts to f32 + bias — inside a fused
    # stage XLA folds that into the conv epilogue, but an isolated
    # measurement of it would pay a full f32 materialization pass and
    # overstate the floor (the first run of this study had every stage
    # "beating" such a ceiling by 1.2-2.6x).
    dn = unet._conv_dim_numbers(fcfg.dims)
    conv_cache: Dict = {}

    def conv_time(spatial, cin, cout, k=3) -> float:
        key = (tuple(spatial), cin, cout, k)
        if key not in conv_cache:
            xx = jnp.asarray(
                rng.standard_normal((1, *spatial, cin)).astype(np.float32)
            ).astype(cdt)
            w = jnp.asarray(
                rng.standard_normal((k,) * len(spatial) + (cin, cout)).astype(
                    np.float32
                )
            ).astype(cdt)
            conv_cache[key] = _rate_scan(
                lambda x, w: jax.lax.conv_general_dilated(
                    x, w, (1,) * len(spatial), "SAME",
                    dimension_numbers=dn,
                ),
                (xx, w), iters,
            )
        return conv_cache[key]

    def tconv_time(spatial_in, cin, cout) -> float:
        # measured as part of the decoder ceiling via a raw 2x2 stride-2
        # transposed conv at identical shapes
        key = ("t", tuple(spatial_in), cin, cout)
        if key not in conv_cache:
            xx = jnp.asarray(
                rng.standard_normal((1, *spatial_in, cin)).astype(np.float32)
            ).astype(cdt)
            w = jnp.asarray(
                rng.standard_normal((2, 2, cout, cin)).astype(np.float32)
            ).astype(cdt)
            conv_cache[key] = _rate_scan(
                lambda x, w: jax.lax.conv_transpose(
                    x, w, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    transpose_kernel=True,
                ),
                (xx, w), iters,
            )
        return conv_cache[key]

    rows = []

    def add_row(name, fn, args, flops, ceiling_s):
        t = _rate_scan(fn, args, iters)
        rows.append({
            "stage": name,
            "ms": round(t * 1e3, 3),
            "gflop": round(flops / 1e9, 2),
            "tflops": round(flops / t / 1e12, 2),
            "ceiling_ms": round(ceiling_s * 1e3, 3),
            "pct_of_ceiling": round(100 * ceiling_s / t, 1) if ceiling_s else 0.0,
        })

    add_row("normalize", stage_norm, (frame,), 0.0, 0.0)
    # encoder
    s0 = (size, size)
    add_row(
        "enc0 (1024², 1→32→32)",
        lambda x: block_stage(x, fparams["enc"][0]),
        (acts["enc0_in"],),
        _conv_flops(3, 1, 32, s0) + _conv_flops(3, 32, 32, s0),
        conv_time(s0, 1, 32) + conv_time(s0, 32, 32),
    )
    for lvl in (1, 2, 3):
        sp = (size >> lvl, size >> lvl)
        cin, cout = feats[lvl - 1], feats[lvl]
        add_row(
            f"enc{lvl} ({sp[0]}², {cin}→{cout}→{cout})",
            functools.partial(
                lambda x, p: pool_block_stage(x, p), p=fparams["enc"][lvl]
            ),
            (acts[f"enc{lvl-1}"],),
            _conv_flops(3, cin, cout, sp) + _conv_flops(3, cout, cout, sp),
            conv_time(sp, cin, cout) + conv_time(sp, cout, cout),
        )
    # decoder
    for i, lvl in enumerate((2, 1, 0)):
        sp = (size >> lvl, size >> lvl)
        sp_in = (size >> (lvl + 1), size >> (lvl + 1))
        cin = feats[lvl + 1]  # channels arriving from below
        cskip = feats[lvl]
        cout = feats[lvl]
        src = acts[f"enc{lvl+1}"] if i == 0 else acts[f"dec{lvl+1}"]
        add_row(
            f"dec{lvl} ({sp[0]}², up{cin}→{cout} ⊕{cskip} →{cout})",
            functools.partial(
                lambda x, skip, up_p, dec_p: dec_stage(x, skip, up_p, dec_p),
                up_p=fparams["up"][i], dec_p=fparams["dec"][i],
            ),
            (src, skips[lvl]),
            2.0 * 4 * cin * cout * float(np.prod(sp_in))
            + _conv_flops(3, cskip + cout, cout, sp)
            + _conv_flops(3, cout, cout, sp),
            tconv_time(sp_in, cin, cout)
            + conv_time(sp, cskip + cout, cout)
            + conv_time(sp, cout, cout),
        )
    add_row(
        "head (1x1→3 + softmax/argmax)",
        stage_head, (acts["dec0"],),
        _conv_flops(1, feats[0], cfg.num_classes, s0),
        0.0,
    )

    total_ms = sum(r["ms"] for r in rows)
    total_gflop = sum(r["gflop"] for r in rows)
    summary = {
        "stage": "TOTAL (sliced) vs fused",
        "ms": round(total_ms, 3),
        "fused_ms": round(t_full * 1e3, 3),
        "gflop": round(total_gflop, 2),
        "tflops_fused": round(total_gflop / 1e3 / t_full, 2),
        # fused/sliced: how much of the sliced sum the real fused graph
        # needs (slice boundaries materialize activations XLA otherwise
        # fuses away, so sliced >= fused and this is <= 100)
        "coverage_pct": round(100 * (t_full * 1e3) / total_ms, 1),
    }
    return rows, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()
    rows, summary = run(args.size, args.iters)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps(summary))
    print()
    print("| stage | ms | GFLOP | TFLOP/s | ceiling ms | % of ceiling |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['stage']} | {r['ms']} | {r['gflop']} | {r['tflops']} "
            f"| {r['ceiling_ms']} | {r['pct_of_ceiling']} |"
        )
    print(
        f"| TOTAL sliced {summary['ms']} ms vs fused {summary['fused_ms']} ms "
        f"| {summary['gflop']} GFLOP | fused {summary['tflops_fused']} TFLOP/s "
        f"| coverage {summary['coverage_pct']}% | |"
    )


if __name__ == "__main__":
    main()
