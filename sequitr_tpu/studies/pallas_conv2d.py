"""Pallas TPU kernel: fused 3x3 conv + bias + activation via in-VMEM im2col.

Why: the U-Net's early levels are thin (32-64 channels). XLA lowers those
convs as matmuls whose weight block fills only ~32x32 of the 128x128 MXU
(~6% utilization — measured 2.08 ms for a 32->32 conv at 1024², ~8.8
TFLOP/s). Rewriting the conv as ONE matmul per tile with the taps folded
into the contraction dim — (tile_px, 9*C_in) @ (9*C_in, C_out) — raises
the weight block to (288+, C_out): the contraction axis saturates the
systolic array and only the N axis stays thin, a ~4x ceiling lift.

Layout: the padded input is viewed as a 2D (rows, W*C) array — channel-
flattened rows. This keeps the HBM DMA constraints satisfiable (2D memrefs
tile (8, 128) over (rows, cols): row slices 8-aligned, full-width cols) and
avoids the 4x lane-padding waste a (H, W, C<128) 3D layout pays in VMEM.
A W-shift of dx pixels is a column shift of dx*C — so the nine im2col taps
are static 2D slices of the row band.

Mechanics per grid step (one row band):
1. async-DMA the (TH+8, W_band*C_in) halo'd row band HBM->VMEM;
2. per static W-tile: concatenate 9 shifted (TH*TW, C_in) views along the
   contraction axis;
3. one MXU matmul per tile, f32 accumulation, fused bias + activation;
4. write each (TH, TW*C_out) piece of the output band.

STATUS — EXPERIMENTAL, NOT WIRED INTO THE MODEL: the in-kernel
(th, tw*C) -> (th*tw, C) reshape is an unsupported Mosaic layout cast on
real TPU (works interpreted); superseded by ``conv2d_gemm`` which needs no
reshape. Kept as the reference im2col formulation. Interpreter mode only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_bias_act"]


def _kernel(
    x_hbm, w_ref, b_ref, y_ref, band, sem, *, th, tw, c_in, c_out, act, w_img
):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * th, th + 8), :], band, sem)
    dma.start()
    dma.wait()
    for j in range(w_img // tw):  # static unroll over W tiles
        cols = []
        for dy in range(3):
            for dx in range(3):
                c0 = (j * tw + dx) * c_in
                cols.append(
                    band[dy : dy + th, c0 : c0 + tw * c_in].reshape(
                        th * tw, c_in
                    )
                )
        xcol = jnp.concatenate(cols, axis=1)  # (th*tw, 9*c_in)
        acc = jnp.dot(xcol, w_ref[:], preferred_element_type=jnp.float32)
        y = acc + b_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        y_ref[:, j * tw * c_out : (j + 1) * tw * c_out] = (
            y.reshape(th, tw * c_out).astype(y_ref.dtype)
        )


def _pick_tiles(h, w_img, c_in, c_out, itemsize):
    """Largest (th, tw) keeping band + im2col + output band under ~12MB."""
    for th in (128, 64, 32, 16, 8):
        if h % th:
            continue
        for tw in (128, 64, 32):
            if w_img % tw:
                continue
            band = (th + 8) * (w_img + 8) * c_in * itemsize
            xcol = th * tw * 9 * c_in * itemsize
            out = th * w_img * c_out * itemsize
            acc = th * tw * c_out * 4
            if band + xcol + out + acc <= 12 * 1024 * 1024:
                return th, tw
    raise ValueError(f"no VMEM-feasible tiling for {(h, w_img, c_in, c_out)}")


@functools.partial(jax.jit, static_argnames=("act", "out_dtype", "interpret"))
def conv3x3_bias_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    act: str = "relu",
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv + bias + activation.

    ``x``: (H, W, C_in); ``w``: (3, 3, C_in, C_out); ``b``: (C_out,).
    Returns (H, W, C_out) in ``out_dtype`` (default x.dtype). H, W must
    admit a VMEM-feasible tiling (divisible by 8 at minimum) and
    ``(W+8)*C_in`` must be a multiple of 128; other shapes use the XLA path.
    """
    h, w_img, c_in = x.shape
    c_out = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    th, tw = _pick_tiles(h, w_img, c_in, c_out, x.dtype.itemsize)

    # pad: +1 halo each side; right/bottom padded further so the band's
    # row count (th+8) and flattened width are DMA-tileable
    w_pad_hi = 7  # 1 halo + 6 alignment cols -> w_band = w_img + 8
    xp = jnp.pad(x, ((1, 7), (1, w_pad_hi), (0, 0)))
    w_band = w_img + 8
    if (w_band * c_in) % 128:
        raise ValueError(
            f"(W+8)*C_in = {w_band * c_in} not 128-aligned; use the XLA conv"
        )
    xp2 = xp.reshape(h + 8, w_band * c_in)
    wk = w.reshape(9 * c_in, c_out).astype(x.dtype)
    bk = b.reshape(1, c_out).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, th=th, tw=tw, c_in=c_in, c_out=c_out, act=act, w_img=w_img
        ),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # halo'd band, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, w_img * c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w_img * c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, w_band * c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp2, wk, bk)
    return out.reshape(h, w_img, c_out)
