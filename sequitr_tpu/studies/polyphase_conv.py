"""Polyphase (space-to-depth weight-equivalent) serving reformulation.

The round-4 whole-graph roofline (BASELINE.md) showed the two thin
full-resolution U-Net levels dominate the 1024^2 north-star graph:
enc0 4.9 ms at 4.1 TFLOP/s and dec0 8.6 ms at 7.2 TFLOP/s — 13.5 of
15.8 ms at 37-41%% of the isolated-conv ceiling, because 32 output
channels feed a quarter of the 128-wide MXU. The existing fix is the
s2d *preset family* — a DIFFERENT model that must be (distill-)trained.

This study measures the one *exact* lever: polyphase decomposition. A
stride-1 3x3 conv on a (2H, 2W, C) tensor is mathematically identical
to a 3x3 conv on its (H, W, 4C) space-to-depth phase tensor with a
structured-zero rearranged kernel: writing an output pixel's row as
2i+a (phase a, block i) and an input row as 2(i+s)+p, a kernel tap dy
contributes to block offset s with dy = 2s + p - a, which lands in
{-1,0,1} for at most a 3-block window — so the phase kernel is
(3, 3, 4C_in, 4C_out) with exactly 9 of every 36 (tap, phase-pair)
slots nonzero. No retraining: the SAME weights, rearranged.

The arithmetic ledger, stated up front (why this could lose): the dense
phase conv spends 9*16 MACs per phase pixel where the original spends
9*4 — a 4x FLOP inflation, traded against the MXU running 128-wide
instead of 32-wide (a measured ~4x utilization gap at these widths).
Around the 3x3 convs the rest of the level is FLOP-neutral or better:

* the 2x2-stride-2 up-conv becomes a single 1x1 phase conv (exact),
* the 2x2 max-pool becomes a max over the 4 phase groups (no spatial
  op at all),
* the 1x1 head becomes a batched matmul over phases (exact),
* ReLU/bias/folded-BN are per-channel elementwise — phase channels are
  just relabeled pixels,
* the skip connection stays IN the phase domain (enc0's pre-pool
  activation feeds dec0's concat without ever re-materializing a
  1024^2 tensor — the whole serving graph drops to 512^2).

Run ``python -m sequitr_tpu.studies.polyphase_conv`` on the chip for
the A/B; results are recorded in BASELINE.md (round 5). Exactness is
asserted here and in tests/test_studies.py: float32 polyphase output
matches ``unet.apply`` to ~1e-4 (same sums, different association).

Spec: SURVEY.md §6 north star; round-4 VERDICT item 3.
"""

from __future__ import annotations

import time

import numpy as np

from sequitr_tpu.models.polyphase import (  # noqa: F401  (re-exported)
    apply as polyphase_apply_core,
    phase_kernel,
    phase_up_kernel,
)

__all__ = [
    "phase_kernel",
    "phase_up_kernel",
    "polyphase_apply",
    "run",
]


def polyphase_apply(cfg, params, state, x):
    """Study-facing alias of the production ``models.polyphase.apply``
    (the transform graduated into the serving path after the A/B below
    measured a 1.58x bf16 whole-graph win)."""
    return polyphase_apply_core(cfg, params, state, x)


# ---------------------------------------------------------------------------
# the on-chip A/B
# ---------------------------------------------------------------------------


def run(size: int = 1024, iters: int = 24) -> dict:
    """Measure production vs polyphase serving graphs on the current
    backend. Returns a dict of timings + exactness stats."""
    import jax
    import jax.numpy as jnp

    from sequitr_tpu.models import unet
    from sequitr_tpu.studies.roofline import _rate, _rate_scan

    results: dict = {"backend": jax.default_backend(), "size": size}

    for dtype_name in ("float32", "bfloat16"):
        dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=4, base_features=32,
            norm="batch", compute_dtype=dtype,
        )
        params, st = unet.init(jax.random.PRNGKey(0), cfg)
        fcfg, fparams, fstate = unet.fold_batchnorm(cfg, params, st)
        x = jnp.asarray(
            np.random.default_rng(0).gamma(2.0, 100.0, (1, size, size, 1)),
            jnp.float32,
        )

        base = jax.jit(
            lambda xx: unet.apply(fcfg, fparams, fstate, xx, False)[0]
        )
        poly = jax.jit(lambda xx: polyphase_apply(fcfg, fparams, fstate, xx))

        yb = np.asarray(base(x))
        yp = np.asarray(poly(x))
        err = float(np.max(np.abs(yb - yp)))
        scale = float(np.max(np.abs(yb)))
        agree = float(
            np.mean(np.argmax(yb, axis=-1) == np.argmax(yp, axis=-1))
        )
        t_base = _rate(lambda: base(x), iters)
        t_poly = _rate(lambda: poly(x), iters)
        ts_base = _rate_scan(lambda xx: base(xx), (x,), iters)
        ts_poly = _rate_scan(lambda xx: poly(xx), (x,), iters)
        results[dtype_name] = {
            "max_abs_err": err,
            "rel_err": err / max(scale, 1e-9),
            "argmax_agree": agree,
            "dispatch_ms": {
                "base": round(t_base * 1e3, 3),
                "poly": round(t_poly * 1e3, 3),
            },
            "scan_ms": {
                "base": round(ts_base * 1e3, 3),
                "poly": round(ts_poly * 1e3, 3),
            },
            "speedup_scan": round(ts_base / ts_poly, 3),
        }
        print(
            f"[{dtype_name}] rel_err {err / max(scale, 1e-9):.2e} "
            f"argmax agree {agree:.4f}  "
            f"scan base {ts_base * 1e3:.2f} ms vs poly {ts_poly * 1e3:.2f} ms "
            f"({ts_base / ts_poly:.2f}x)  "
            f"dispatch base {t_base * 1e3:.2f} / poly {t_poly * 1e3:.2f}",
            flush=True,
        )
    return results


def main():
    t0 = time.perf_counter()
    res = run()
    res["wall_s"] = round(time.perf_counter() - t0, 1)
    import json

    print(json.dumps(res))


if __name__ == "__main__":
    main()
