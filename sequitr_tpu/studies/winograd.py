"""Winograd F(2x2, 3x3) convolution — FLOP-reduced 3x3 conv in pure XLA.

The thin (32-64 channel) U-Net convs are FLOP-bound at the MXU's ~6%
direct-conv ceiling for small channel counts (BASELINE.md headroom
analysis); no data-movement trick lifts that ceiling. Winograd attacks the
arithmetic instead: each 2x2 output tile costs 16 multiplies in the
transform domain vs 36 for direct 3x3 — a 2.25x FLOP cut at identical MXU
utilization.

    Y = A^T [ (G g G^T) . (B^T d B) ] A          (Lavin & Gray, 2015)

Everything is expressed as XLA ops: the 16 input-transform components are
+-1 linear combinations of 16 strided views (VPU adds that XLA fuses into
the batched matmul), the 16 per-component matmuls contract C_in -> C_out
on the MXU, and the output transform is another fused +-combination.
Differentiable, jit/vmap-safe, TPU and CPU alike.

Numerics: transforms run in float32; the per-component matmuls honor the
requested compute dtype with float32 accumulation. F(2,3) transform
constants are exact in binary floating point (0, ±1, ±0.5), so f32
Winograd matches direct f32 conv to ~1e-6 relative.

STATUS — EXPERIMENTAL, PARKED (measured v5e, 1024², bf16): 32->32 in
1.84 ms vs 1.46 ms for XLA's direct conv; 64->64 blows up to 77 ms (XLA
materializes the 16 transform-domain tensors in HBM instead of fusing
them into the matmuls — 16x traffic amplification swamps the 2.25x FLOP
cut). A VMEM-resident Pallas Winograd would hit the same amplification
inside the 16MB budget. Final conclusion of the round-1 conv study
(BASELINE.md): XLA's direct conv is the right kernel at these channel
widths; arithmetic-level wins require int8 or a wider-channel model.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["winograd_conv3x3", "transform_weights"]

# F(2x2, 3x3) transform matrices (exact binary-float entries)
_B_T = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
_A_T = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) -> transform-domain weights (4, 4, C_in, C_out)."""
    g = w.astype(jnp.float32)
    u = jnp.einsum("ij,jkco->ikco", jnp.asarray(_G), g)
    return jnp.einsum("ikco,lk->ilco", u, jnp.asarray(_G))


def winograd_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv of ``x`` (N, H, W, C_in), H and W even.

    Returns float32 (N, H, W, C_out).
    """
    n, h, w_img, c_in = x.shape
    c_out = w.shape[-1]
    if h % 2 or w_img % 2:
        raise ValueError(f"H, W must be even for F(2,3) tiling, got {h}x{w_img}")
    ty, tx = h // 2, w_img // 2

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[a, b] (a,b in 0..3): strided views so tile (i,j) sees rows 2i..2i+3
    d = [
        [
            jax.lax.slice(
                xp,
                (0, a, bcol, 0),
                (n, a + 2 * ty - 1, bcol + 2 * tx - 1, c_in),
                (1, 2, 2, 1),
            )
            for bcol in range(4)
        ]
        for a in range(4)
    ]

    bt = _B_T
    # V[i][j] = sum_{a,b} B_T[i,a] * B_T[j,b] * d[a][b] — sparse +-1 combos
    def row_combo(mat_row, items):
        out = None
        for coeff, item in zip(mat_row, items):
            if coeff == 0:
                continue
            term = item if coeff == 1 else (-item if coeff == -1 else coeff * item)
            out = term if out is None else out + term
        return out

    dv = [[row_combo(bt[i], [d[a][bcol] for a in range(4)]) for bcol in range(4)] for i in range(4)]
    v = [[row_combo(bt[j], dv[i]) for j in range(4)] for i in range(4)]

    u = transform_weights(w)  # (4, 4, C_in, C_out) f32

    # 16 component matmuls: (N*ty*tx, C_in) @ (C_in, C_out)
    m = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            vi = v[i][j].astype(compute_dtype)
            ui = u[i, j].astype(compute_dtype)
            m[i][j] = jax.lax.dot_general(
                vi.reshape(-1, c_in),
                ui,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(n, ty, tx, c_out)

    at = _A_T
    ma = [[row_combo(at[k], m[i]) for k in range(2)] for i in range(4)]
    y = [[row_combo(at[k], [ma[i][l] for i in range(4)]) for l in range(2)] for k in range(2)]

    # interleave the 2x2 output phases back to (N, H, W, C_out)
    out = jnp.stack(
        [jnp.stack([y[0][0], y[0][1]], axis=3), jnp.stack([y[1][0], y[1][1]], axis=3)],
        axis=2,
    )  # (N, ty, 2, tx, 2, C_out)
    out = out.reshape(n, h, w_img, c_out)
    if b is not None:
        out = out + b
    return out
