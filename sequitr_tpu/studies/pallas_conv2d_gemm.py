"""Pallas TPU kernel: 3x3 conv as a full-MXU transposed GEMM.

The U-Net's thin levels (32/64 channels) cap XLA's conv at ~6% MXU
utilization: with pixels in lanes and channels contracted, the systolic
array's 128x128 weight tile only sees a (C_in<=64, C_out<=64) block.

This kernel transposes the problem: **channels live in sublanes, pixels in
lanes**. With the image flattened row-major (one padded row of ``Wb``
elements per image row), every conv tap is a constant flat shift of
``dy*Wb + dx`` — so the im2col matrix needs NO reshapes, only nine shifted
2D slices stacked along the sublane axis:

    y^T (C_out, px) = W' (C_out, 9*C_in) @ xcol^T (9*C_in, px)

The contraction (K = 9*C_in >= 288) and the pixel axis (N = chunk of
thousands) both exceed 128, so the MXU runs full weight tiles — the thin
channel count only shrinks M (streamed), not the array tile. The 1-column
padding ring absorbs the row-wrap artifacts of flat shifting (standard
flattened-conv trick), and a per-chunk column mask re-zeroes the ring for
the next layer.

Layout contract (see ``flatten_chw`` / ``unflatten_chw``):
    xT_flat: (C, MARGIN + (H+16) * Wb), Wb = W + 8, zero ring,
    pixel (r, c) of the padded image at flat index MARGIN + r*Wb + c.
The H+16 / Wb=W+8 / MARGIN=128 paddings exist purely to satisfy DMA
alignment (2D HBM slices need 128-aligned offsets/extents on the minor
axis; 8-aligned on the second-minor).

STATUS — EXPERIMENTAL, NOT WIRED INTO THE MODEL. Measured (v5e, 1024x1024,
bf16): 32->32 in 2.23 ms vs 2.08 ms for XLA's NHWC conv. The MXU tile win
is real but fully consumed by im2col data movement: the nine tap views have
lane offsets of (dy*Wb + dx) mod 128 != 0, and Mosaic's unaligned-lane
relayout (one per tap per chunk) costs as much as the matmul saves. A
follow-up design would pre-shift the input into three dx-aligned copies in
HBM (making every tap 128-aligned) and accumulate nine aligned matmuls —
estimated ~2.5x over XLA, at the cost of 3x input DMA. Parked: XLA's conv
is within ~2x of the channel-bound roofline here (see BASELINE.md headroom
analysis), so the framework keeps the XLA conv path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_gemm", "flatten_chw", "unflatten_chw"]

MARGIN = 128  # front pad so the (-Wb-1) tap of the first pixel stays in-bounds


def _wb(w_img: int) -> int:
    return w_img + 8


def flatten_chw(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> the kernel's flat transposed layout (C, MARGIN+(H+16)*Wb)."""
    h, w_img, c = x.shape
    xt = jnp.transpose(x, (2, 0, 1))  # (C, H, W)
    xt = jnp.pad(xt, ((0, 0), (1, 15), (1, 7)))  # ring + alignment pads
    flat = xt.reshape(c, (h + 16) * _wb(w_img))
    return jnp.pad(flat, ((0, 0), (MARGIN, 0)))


def unflatten_chw(y_flat: jnp.ndarray, h: int, w_img: int) -> jnp.ndarray:
    """Kernel output (C, h*Wb) -> (H, W, C)."""
    c = y_flat.shape[0]
    y = y_flat.reshape(c, h, _wb(w_img))[:, :, 1 : 1 + w_img]
    return jnp.transpose(y, (1, 2, 0))


def _kernel(
    x_hbm, w_ref, b_ref, y_ref, band, xcol, sem, *, th, c_in, c_out, act, w_img, chunk
):
    wb = _wb(w_img)
    i = pl.program_id(0)
    # rows [i*th, i*th+th+16) of the padded image, plus the MARGIN elements
    # sitting immediately before them in the flat array
    dma = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(i * th * wb, (th + 16) * wb + MARGIN)], band, sem
    )
    dma.start()
    dma.wait()
    # local flat index of output pixel (padded row 1, col 0) of this band
    q0 = MARGIN + wb
    total = th * wb
    n_chunks = total // chunk
    for n in range(n_chunks):  # static
        # stack the 9 shifted tap views along the sublane axis; explicit
        # stores (not concat) so Mosaic re-aligns the shifted lane offsets
        for t, (dy, dx) in enumerate(
            (dy, dx) for dy in (0, 1, 2) for dx in (0, 1, 2)
        ):
            s = q0 + n * chunk + (dy - 1) * wb + (dx - 1)
            xcol[t * c_in : (t + 1) * c_in, :] = band[:, s : s + chunk]
        acc = jnp.dot(w_ref[:], xcol[:], preferred_element_type=jnp.float32)
        y = acc + b_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        # zero the padding columns so the ring stays clean for the next layer
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + (n * chunk)
        col = jax.lax.rem(lane, wb)
        mask = jnp.logical_and(col >= 1, col <= w_img)
        y = jnp.where(mask, y, 0.0)
        y_ref[:, n * chunk : (n + 1) * chunk] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("h", "w_img", "act", "out_dtype", "interpret")
)
def conv3x3_gemm(
    x_flat: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    h: int,
    w_img: int,
    act: str = "relu",
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv + bias + activation in the flat CHW layout.

    ``x_flat``: output of ``flatten_chw`` (C_in, MARGIN+(H+16)*Wb);
    ``w``: (3, 3, C_in, C_out); ``b``: (C_out,). Returns (C_out, H*Wb) —
    feed through ``unflatten_chw`` or re-pad for a following layer.
    H must be divisible by a tile in {64, 32, 16} (so offsets stay
    128-aligned for any W).
    """
    c_in = x_flat.shape[0]
    c_out = w.shape[-1]
    out_dtype = out_dtype or x_flat.dtype
    wb = _wb(w_img)

    th = None
    for cand in (64, 32, 16):
        if h % cand == 0:
            # band + output block + im2col scratch must fit 16MB VMEM with
            # pipelining headroom; cap the band at ~3.5MB
            if c_in * ((cand + 16) * wb + MARGIN) * x_flat.dtype.itemsize <= 3_670_016:
                th = cand
                break
    if th is None:
        raise ValueError(f"no feasible row tile for H={h}, W={w_img}, C={c_in}")
    total = th * wb
    chunk = total
    for cand in (4096 + 32, 2048 + 16, 1024 + 8):
        # chunk sizes that divide th*wb exactly keep every matmul identical
        if total % cand == 0:
            chunk = cand
            break

    # W' rows: (c_out, 9*c_in), tap-major blocks of c_in to match xcol order
    wk = jnp.transpose(w.reshape(9, c_in, c_out), (2, 0, 1)).reshape(
        c_out, 9 * c_in
    ).astype(x_flat.dtype)
    bk = b.reshape(c_out, 1).astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(
            _kernel, th=th, c_in=c_in, c_out=c_out, act=act, w_img=w_img,
            chunk=chunk,
        ),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (c_out, th * wb), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c_out, h * wb), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((c_in, (th + 16) * wb + MARGIN), x_flat.dtype),
            pltpu.VMEM((9 * c_in, chunk), x_flat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_flat, wk, bk)
