"""Pallas TPU kernel v2: 3x3 conv as an ALIGNED full-MXU transposed GEMM.

Successor to ``conv2d_gemm`` (parked): that version lost its MXU win to
Mosaic relayouts, because the nine im2col taps sit at lane offsets
``(dy*Wb + dx) % 128 != 0``. This version makes every tap slice 128-aligned:

* the flat row stride is forced to ``Wb ≡ 0 (mod 128)`` (W + pad);
* the ``dx ∈ {-1, +1}`` shifts are materialized ONCE per row band as two
  in-VMEM shifted copies of the band (one unaligned copy each, amortized
  over all chunks), after which every tap of every chunk is an aligned
  slice of one of the three band buffers;
* the nine taps are stored into an (9*C_in, chunk) im2col scratch at
  aligned offsets, and contracted in ONE matmul per chunk:
      y^T (C_out, chunk) = W' (C_out, 9*C_in) @ xcol (9*C_in, chunk)
  with K = 9*C_in >= 288 and N = chunk >= 4608 — full 128x128 MXU tiles.

Layout contract: ``flatten_chw2`` / ``unflatten_chw2`` (channel-major flat
rows of stride Wb, 1-px zero ring, 128-element front margin).

STATUS — EXPERIMENTAL, PARKED (measured v5e, 1024², bf16, 32->32: 1.98 ms
vs XLA 2.08 ms). With alignment solved, the remaining walls are
fundamental for thin channels: (a) the MXU's 128x128 OUTPUT tile is ≤25%
utilized whenever one output dim is C<=32, whichever way the GEMM is
oriented; (b) im2col amplifies VMEM traffic 9x. XLA's direct conv — nine
K=C_in matmuls with no im2col — sits at almost exactly the direct-conv
ceiling (6.25% MXU = 12.3 TFLOP/s -> 1.5 ms ideal, 2.08 measured), so
there is no data-movement win left at this channel width. The remaining
levers are arithmetic: Winograd F(2,3) (2.25x FLOP cut) or wider/int8
channels. Full chronology in BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_gemm2", "flatten_chw2", "unflatten_chw2", "wb2"]

MARGIN = 128


def wb2(w_img: int) -> int:
    """Flat row stride: smallest multiple of 128 >= w_img + 2."""
    return ((w_img + 2 + 127) // 128) * 128


def flatten_chw2(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (C, MARGIN + (H+16) * Wb), Wb 128-aligned, zero ring."""
    h, w_img, c = x.shape
    wb = wb2(w_img)
    xt = jnp.transpose(x, (2, 0, 1))
    xt = jnp.pad(xt, ((0, 0), (1, 15), (1, wb - w_img - 1)))
    flat = xt.reshape(c, (h + 16) * wb)
    return jnp.pad(flat, ((0, 0), (MARGIN, 0)))


def unflatten_chw2(y_flat: jnp.ndarray, h: int, w_img: int) -> jnp.ndarray:
    c = y_flat.shape[0]
    y = y_flat.reshape(c, h, wb2(w_img))[:, :, 1 : 1 + w_img]
    return jnp.transpose(y, (1, 2, 0))


def _kernel(
    x_hbm, w_ref, b_ref, y_ref, band0, band_m, band_p, xcol, sem,
    *, th, c_in, c_out, act, w_img, chunk,
):
    wb = wb2(w_img)
    i = pl.program_id(0)
    band_len = (th + 16) * wb + MARGIN
    dma = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(i * th * wb, band_len)], band0, sem
    )
    dma.start()
    dma.wait()
    # one unaligned copy per dx shift, amortized over all taps/chunks
    band_m[:, : band_len - 1] = band0[:, 1:]  # dx = +1 view (x shifted left)
    band_p[:, 1:] = band0[:, : band_len - 1]  # dx = -1 view (x shifted right)
    bands = {-1: band_p, 0: band0, 1: band_m}
    # NOTE: band_p[:, 0] / band_m[:, -1] are stale scratch, but they are only
    # reachable from pad-column outputs which the mask zeroes below.

    q0 = MARGIN + wb  # local flat index of output (row 1, col 0)
    n_chunks = (th * wb) // chunk
    for n in range(n_chunks):  # static
        for t, (dy, dx) in enumerate(
            (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        ):
            s = q0 + n * chunk + dy * wb  # 128-aligned by construction
            src = bands[dx]  # dx shift is baked into the band copy
            xcol[t * c_in : (t + 1) * c_in, :] = src[:, s : s + chunk]
        acc = jnp.dot(w_ref[:], xcol[:], preferred_element_type=jnp.float32)
        y = acc + b_ref[:]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + (n * chunk)
        col = jax.lax.rem(lane, wb)
        mask = jnp.logical_and(col >= 1, col <= w_img)
        y = jnp.where(mask, y, 0.0)
        y_ref[:, n * chunk : (n + 1) * chunk] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("h", "w_img", "act", "out_dtype", "interpret")
)
def conv3x3_gemm2(
    x_flat: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    h: int,
    w_img: int,
    act: str = "relu",
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv + bias + activation, aligned-GEMM formulation.

    ``x_flat``: output of ``flatten_chw2``; ``w``: (3, 3, C_in, C_out);
    ``b``: (C_out,). Returns (C_out, H*Wb).
    """
    c_in = x_flat.shape[0]
    c_out = w.shape[-1]
    out_dtype = out_dtype or x_flat.dtype
    wb = wb2(w_img)

    th = None
    for cand in (32, 16, 8):
        if h % cand:
            continue
        band_bytes = c_in * ((cand + 16) * wb + MARGIN) * x_flat.dtype.itemsize
        if 3 * band_bytes <= 6 * 2**20:
            th = cand
            break
    if th is None:
        raise ValueError(f"no feasible row tile for H={h}, W={w_img}, C={c_in}")
    total = th * wb
    chunk = total
    for cand in (4608, 4096, 2304, 2048, 1152, 1024, 512):
        if total % cand == 0 and cand % 128 == 0:
            chunk = cand
            break

    wk = jnp.transpose(w.reshape(9, c_in, c_out), (2, 0, 1)).reshape(
        c_out, 9 * c_in
    ).astype(x_flat.dtype)
    bk = b.reshape(c_out, 1).astype(jnp.float32)

    band_len = (th + 16) * wb + MARGIN
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
            pltpu.VMEM((c_in, band_len), x_flat.dtype),
            pltpu.VMEM((c_in, band_len), x_flat.dtype),
            pltpu.VMEM((c_in, band_len), x_flat.dtype),
            pltpu.VMEM((9 * c_in, chunk), x_flat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_flat, wk, bk)
