"""Pallas TPU kernel: streaming intensity histogram for percentile normalize.

XLA lowers ``jnp.bincount``/quantile-by-sort poorly on TPU (scatter or a
full O(N log N) sort). This kernel computes a fixed-bin histogram of a 2D
frame in one streaming pass: the grid walks row-blocks (sequential on a TPU
core, so a VMEM scratch accumulator carries across grid steps), each block
bucketizes its pixels and accumulates counts via a compare-and-reduce
against a bin iota — pure VPU work at HBM-bandwidth cost, ~10x faster than
the sort-based exact path on 1M-pixel frames.

Used by ``sequitr_tpu.ops.normalize.percentile_normalize_fast`` on TPU;
tests run the same kernel in interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["histogram_2d", "pallas_quantiles"]


def _hist_kernel(x_ref, lo_ref, scale_ref, hist_ref, *, bins: int, block_rows: int):
    """Accumulate a histogram of one row-block into ``hist_ref``.

    x_ref: (block_rows, W) f32 VMEM; lo/scale: (1, 1) f32 SMEM;
    hist_ref: (1, bins) f32 VMEM output, accumulated across the grid
    (sequential on a TPU core, so the += carries).

    Rows are visited with a STATIC Python loop (Mosaic cannot lower
    dynamic_slice over traced offsets inside the kernel); each row's bucket
    indices are compared against a bin iota and reduced — pure VPU
    compare-and-accumulate at streaming bandwidth.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    x = x_ref[:]
    lo = lo_ref[0, 0]
    scale = scale_ref[0, 0]
    idx = jnp.clip(((x - lo) * scale), 0.0, float(bins - 1)).astype(jnp.int32)
    w = idx.shape[1]
    # chunk the row so the (chunk, bins) one-hot stays within the 16 MB
    # scoped-VMEM budget at any frame width: Mosaic keeps several unrolled
    # iterations' temporaries live on the stack, so a 4096-wide (or even
    # 1024-wide at 4096² frames) one-hot OOMs the compile. 256 is the
    # measured sweet spot (128 paradoxically allocates MORE — the stack
    # allocator is non-monotonic in chunk count; BASELINE.md round 2)
    chunk = min(w, 256)
    assert w % chunk == 0, (w, chunk)
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, bins), 1)
    acc = jnp.zeros((1, bins), jnp.float32)
    for r in range(block_rows):  # static unroll
        for c0 in range(0, w, chunk):
            onehot = (idx[r, c0 : c0 + chunk][:, None] == bin_iota).astype(
                jnp.float32
            )
            acc += jnp.sum(onehot, axis=0, keepdims=True)
    hist_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("bins", "block_rows", "interpret")
)
def histogram_2d(
    x: jnp.ndarray,
    lo: jnp.ndarray,
    scale: jnp.ndarray,
    bins: int = 1024,
    block_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Histogram of ``x`` (H, W) f32 with bucket = clip((v-lo)*scale, 0, bins-1).

    Returns (bins,) float32 counts. ``H`` must be divisible by
    ``block_rows`` (the caller pads; see ``pallas_quantiles``).
    """
    h, w = x.shape
    assert h % block_rows == 0, (h, block_rows)
    grid = (h // block_rows,)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, bins=bins, block_rows=block_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bins), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, bins), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        lo.reshape(1, 1).astype(jnp.float32),
        scale.reshape(1, 1).astype(jnp.float32),
    )
    return hist[0]


def pallas_quantiles(
    x: jnp.ndarray,
    qs,
    bins: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Approximate quantiles of a 2D frame via the Pallas histogram.

    Returns (len(qs),) float32. Max error ~ one bin of the value range.
    Pads rows to a block multiple and columns to the kernel's chunk
    multiple with +inf (landing in the top bin, then subtracted from its
    count).
    """
    x = x.astype(jnp.float32)
    h, w = x.shape
    block_rows = 8
    pad_rows = (-h) % block_rows
    # must match _hist_kernel's chunk = min(w, 256): widths that are not a
    # chunk multiple (e.g. 480, 640) pad up to one; larger widths pad to a
    # 256 multiple (not 1024 — that nearly doubled work at e.g. w=1280)
    pad_cols = (-w) % min(w, 256) if w else 0
    if pad_cols:
        x = jnp.concatenate(
            [x, jnp.full((h, pad_cols), jnp.inf, jnp.float32)], axis=1
        )
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.full((pad_rows, x.shape[1]), jnp.inf, jnp.float32)]
        )
    n_pad = x.size - h * w

    lo = jnp.min(x[: h or 1, :w])
    hi = jnp.max(jnp.where(jnp.isfinite(x), x, -jnp.inf))
    scale = (bins - 1) / jnp.maximum(hi - lo, 1e-20)
    hist = histogram_2d(
        x, lo, scale, bins=bins, block_rows=block_rows,
        interpret=interpret,
    )
    if n_pad:
        hist = hist.at[bins - 1].add(-float(n_pad))
    total = h * w
    cdf = jnp.cumsum(hist) / total
    # bin upper-edge values (midpoint-corrected as in ops.normalize)
    edges = lo + (jnp.arange(1, bins + 1, dtype=jnp.float32)) / scale - 0.5 / scale

    qs = jnp.asarray(qs, jnp.float32)

    def invert(q):
        first = jnp.argmax(cdf >= q)
        return edges[first]

    return jax.vmap(invert)(qs)
