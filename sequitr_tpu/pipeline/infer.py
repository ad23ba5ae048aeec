"""Fused tiled sliding-window inference — the north-star path.

Rebuilds sequitr's per-frame inference chain (SURVEY.md §3.3):

    normalize -> extract overlapping patches -> batched net forward
    -> weighted stitch-blend -> softmax probs + argmax label map

as ONE jit-compiled XLA graph per frame shape, instead of the reference's
per-stage host round-trips. Timelapse stacks stream through with the next
frame's host->HBM copy overlapped with compute (double buffering via async
dispatch), per BASELINE.json's north-star description.

Data-parallel multi-chip execution lives in ``sequitr_tpu.parallel``; this
module is the single-chip building block it shards.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sequitr_tpu.models import polyphase, unet
from sequitr_tpu.ops import normalize as norm_ops
from sequitr_tpu.ops import tiling

__all__ = [
    "TileConfig",
    "make_frame_inferrer",
    "cached_frame_inferrer",
    "cached_gan_enhancer",
    "make_denoiser",
    "cached_denoiser",
    "infer_stack",
    "stream_frames",
    "InferenceResult",
]


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Tiling + normalization config for sliding-window inference."""

    patch: Tuple[int, ...] = (256, 256)
    overlap: Tuple[int, ...] = (64, 64)
    window: str = "hann"
    normalize: str = "auto"  # "auto" | "pallas" | "fast" | "exact" | "none"
    p_lo: float = 5.0
    p_hi: float = 99.5
    patch_batch: Optional[int] = None  # chunk patches to bound HBM (None = all)
    # dtype of the emitted label map. The server passes "uint16": the cast
    # happens on device inside the fused graph, halving every label-map
    # D2H transfer (this machine's relay D2H is ~1 s/MB, BASELINE.md)
    labels_dtype: str = "int32"
    # dtype of the emitted softmax maps. "float16" halves the probs D2H
    # (the dominant transfer of a save_probs job: K planes per frame) and
    # the on-disk probs.tif. argmax runs on the f32 maps BEFORE the cast,
    # so the label output is unaffected.
    probs_dtype: str = "float32"
    # test-time augmentation: average softmax maps over 2/4/8 symmetry
    # variants of the whole frame (flips; 8 adds the transpose in 2D —
    # square frames only — or the z-flip in 3D). tta x the compute for a
    # fidelity bump; stays ONE fused graph (variants unrolled inside it).
    tta: int = 1
    # polyphase serving forward (models.polyphase): runs the two thin
    # full-resolution U-Net levels at half resolution x 4-wide channels
    # with the SAME weights, exactly (up to float reassociation) —
    # measured 1.58x whole-graph at 1024^2 bf16 on the v5e chip, argmax
    # agreement 0.9999. 2D folded/norm-free transpose-upsample models
    # with even patch dims only; build fails loudly otherwise.
    polyphase: bool = False
    # False = labels-only graph: the softmax-map output is neither
    # materialized nor returned (``infer`` yields ``(None, labels)``).
    # The default segmentation job saves only the label map, and the
    # probs half of the dual graph costs real time (measured 77.7 vs
    # 68.7 fps at 1024^2 polyphase bf16); single-tile no-TTA serves skip
    # the softmax entirely (argmax of logits == argmax of softmax —
    # labels bit-identical). The server sets this from save_probs/
    # save_entropy; library callers keep the dual default.
    emit_probs: bool = True

    def __post_init__(self):
        if self.probs_dtype not in ("float32", "float16"):
            raise ValueError(
                f"probs_dtype must be 'float32' or 'float16', got {self.probs_dtype!r}"
            )
        if self.tta not in (1, 2, 4, 8):
            raise ValueError(f"tta must be 1, 2, 4 or 8, got {self.tta}")
        # patch_batch=0 is a plausible "disable chunking" spelling; accept
        # only None (auto) or >=1 rather than silently treating 0 as auto
        if self.patch_batch is not None and self.patch_batch < 1:
            raise ValueError(
                f"patch_batch must be None (auto) or >= 1, got {self.patch_batch}"
            )


@dataclasses.dataclass
class InferenceResult:
    probs: jnp.ndarray  # (*spatial, K) float32 softmax map
    labels: jnp.ndarray  # (*spatial,) int32 label map


def _normalize(frame: jnp.ndarray, tc: TileConfig) -> jnp.ndarray:
    """Frame arrives (*spatial, C); percentiles are per-frame over all pixels.

    ``auto`` picks the Pallas streaming-histogram kernel on TPU for
    single-channel 2D frames and 3D volumes (~6-7x faster than XLA's
    bincount lowering) and the XLA histogram path elsewhere.
    """
    mode = tc.normalize
    # frames may arrive in their storage dtype (uint16 stacks transfer
    # half the bytes of a host-side f32 cast); cast on device first
    frame = frame.astype(jnp.float32)
    # multi-channel frames normalize each channel independently (different
    # fluorophores have unrelated intensity scales)
    per_channel = frame.shape[-1] > 1
    if mode == "none":
        return frame
    if mode == "exact":
        return norm_ops.percentile_normalize(
            frame, tc.p_lo, tc.p_hi, channel_axis=per_channel
        )
    if mode == "auto":
        # 2D frames and 3D volumes, any channel count: the histogram kernel
        # is row-layout-agnostic (per-frame percentiles over the pixel
        # multiset) and vmaps over channels in one launch
        on_tpu = jax.default_backend() == "tpu"
        mode = "pallas" if (on_tpu and frame.ndim in (3, 4)) else "fast"
    if mode == "pallas":
        if per_channel:
            return norm_ops.percentile_normalize_pallas(
                frame, tc.p_lo, tc.p_hi, channel_axis=True
            )
        out = norm_ops.percentile_normalize_pallas(frame[..., 0], tc.p_lo, tc.p_hi)
        return out[..., None]
    return norm_ops.percentile_normalize_fast(
        frame, tc.p_lo, tc.p_hi, channel_axis=per_channel
    )


def tiled_apply(
    forward: Callable,
    x: jnp.ndarray,
    grid,
    spatial: Tuple[int, ...],
    tc: TileConfig,
    out_channels: int,
) -> jnp.ndarray:
    """extract patches -> (chunked) ``forward`` -> stitch, for any network.

    The shared tiling machinery behind both the segmentation inferrer and
    the GAN enhancement pass:

    * large grids (>32 tiles) use the rolled ``lax.scan`` extract/stitch
      forms — the unrolled HLO is O(tiles) and a 169-tile 4096^2 graph
      exceeds this machine's remote compile helper (BASELINE.md round 2);
      small grids stay unrolled (freely schedulable slices);
    * ``tc.patch_batch`` bounds peak HBM by running patches in fixed-size
      ``lax.map`` chunks; when unset, grids >32 tiles default to chunks of
      8 so giant frames never materialize every patch activation at once.

    ``forward``: (N, *patch, C_in) -> (N, *patch, out_channels).
    """
    rolled = len(grid) > 32
    extract = tiling.extract_patches_scan if rolled else tiling.extract_patches
    patches = extract(x, grid, tc.patch)  # (T, *patch, C)
    t = patches.shape[0]
    # auto chunk width 16 for giant grids: measured 70.2 vs 65.2 Mpx/s at
    # patch_batch 8 on the 4096^2 config (24 regresses to 57.9) — round 3
    patch_batch = tc.patch_batch if tc.patch_batch is not None else (16 if t > 32 else None)
    if patch_batch is None or patch_batch >= t:
        # Mosaic pads the conv batch axis to a multiple of 8, so a 25-patch
        # batch costs the same as 32 (measured: 19.3 vs 14.4 ms for 24 at
        # 256^2). Split off the sub-multiple tail into its own (cheap,
        # unpadded-main) forward inside the same graph: 25 -> 24+1 runs
        # 12% faster than one padded batch.
        main = (t // 8) * 8
        if t > 8 and 0 < main < t:
            out_patches = jnp.concatenate(
                [forward(patches[:main]), forward(patches[main:])]
            )
        else:
            out_patches = forward(patches)
    else:
        b = patch_batch
        pad = (-t) % b
        padded = jnp.concatenate(
            [patches, jnp.zeros((pad,) + patches.shape[1:], patches.dtype)]
        )
        chunks = padded.reshape((padded.shape[0] // b, b) + patches.shape[1:])
        out_patches = jax.lax.map(forward, chunks).reshape(
            (-1,) + tc.patch + (out_channels,)
        )[:t]
    stitch = tiling.stitch_patches_scan if rolled else tiling.stitch_patches
    return stitch(out_patches, grid, spatial, tc.overlap, tc.window)


def _tta_variants(nd: int, tta: int, spatial: Tuple[int, ...]):
    """Symmetry variants as (flip_axes, transpose) pairs, identity first.

    Each variant is an involution-composition: fwd = transpose∘flips,
    inv = flips∘transpose, so inv(fwd(x)) == x. 2D tta=8 composes the 4
    flips with the transpose (square frames only — the tiling grid must
    be valid for the transposed frame); 3D tta=8 is the full 2^3 flip
    group including z.
    """
    if tta == 1:
        return [((), False)]
    if nd == 2:
        flips4 = [(), (0,), (1,), (0, 1)]
        if tta == 2:
            return [((), False), ((0,), False)]
        if tta == 4:
            return [(f, False) for f in flips4]
        if spatial[0] != spatial[1]:
            raise ValueError(
                f"tta=8 in 2D adds the transpose and needs a square frame, "
                f"got {spatial}"
            )
        return [(f, t) for t in (False, True) for f in flips4]
    # 3D: in-plane axes are (1, 2); axis 0 is z
    if tta == 2:
        return [((), False), ((1,), False)]
    if tta == 4:
        return [(f, False) for f in [(), (1,), (2,), (1, 2)]]
    return [
        (f, False)
        for f in [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)]
    ]


def _tta_average(run: Callable, x: jnp.ndarray, variants) -> jnp.ndarray:
    """Average ``run`` over symmetry variants: apply the transform to the
    input, inverse-transform the output, accumulate (shared by the U-Net
    and GAN inferrers — the variants and their inverses must stay in
    lockstep)."""
    acc = None
    for flips, transpose in variants:
        xi = x
        for ax in flips:
            xi = jnp.flip(xi, axis=ax)
        if transpose:
            xi = jnp.swapaxes(xi, 0, 1)
        oi = run(xi)
        if transpose:
            oi = jnp.swapaxes(oi, 0, 1)
        for ax in flips:
            oi = jnp.flip(oi, axis=ax)
        acc = oi if acc is None else acc + oi
    return acc if len(variants) == 1 else acc / len(variants)


def _check_polyphase(tc: TileConfig, run_cfg) -> None:
    """Build-time gate shared by every serving maker that honors
    ``tc.polyphase`` (segmentation 2D/3D, GAN, N2V, flows, stars — all
    serve the same U-Net family, so the same thin-level reformulation
    applies; models.polyphase has the measured ledger). 3D models use
    the (1, 2, 2) phase factor (z never phased)."""
    if not tc.polyphase:
        return
    ok = (
        polyphase.eligible3d(run_cfg, tc.patch)
        if run_cfg.dims == 3
        else polyphase.eligible(run_cfg, tc.patch)
    )
    if not ok:
        raise ValueError(
            "polyphase serving requires a transpose-upsample model "
            "without model-level space_to_depth and an even patch "
            "(H, W axes for 3D); "
            f"got dims={run_cfg.dims} s2d={run_cfg.space_to_depth} "
            f"upsample={run_cfg.upsample!r} patch={tc.patch}"
        )


def _polyphase_apply(run_cfg, params, state, batch):
    """Dims-dispatching polyphase forward (2D or volumetric)."""
    if run_cfg.dims == 3:
        return polyphase.apply3d(run_cfg, params, state, batch)
    return polyphase.apply(run_cfg, params, state, batch)


def make_frame_inferrer(
    cfg: unet.UNetConfig,
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    jit: bool = True,
) -> Callable:
    """Build ``infer(params, state, frame) -> (probs, labels)`` for one shape.

    ``frame``: (*frame_spatial,) or (*frame_spatial, C_in). The returned
    callable is a single fused jit graph: normalize, tile, batched U-Net
    forward over all patches, stitch-blend of softmax maps, argmax.

    Softmax is applied per-patch BEFORE stitching so overlap blending
    averages probabilities, keeping stitched maps in the simplex (spec
    decision; SURVEY.md §2 'Weighted stitch-blend' blends softmax outputs).

    Frames smaller than the patch on any axis are auto-padded (mirror
    reflection at the trailing edge — natural image statistics, no sharp
    zero border) up to the patch size and the outputs cropped back, so a
    200x200 FOV serves under the default 256^2 patch instead of failing.
    Normalization runs BEFORE padding: percentile stats come from real
    pixels only.

    ``tc.tta > 1`` averages softmax maps over whole-frame symmetry
    variants (``_tta_variants``) INSIDE the same fused graph — normalize
    runs once (percentiles are flip-invariant), each variant re-runs
    tile -> net -> stitch on the transformed frame and is inverse-
    transformed before averaging; argmax sees the averaged maps.
    """
    nd = len(frame_spatial)
    edge_pad = tuple(max(0, p - s) for s, p in zip(frame_spatial, tc.patch))
    padded_spatial = tuple(s + d for s, d in zip(frame_spatial, edge_pad))
    # "symmetric" allows pad == size (whole-frame mirror); beyond that the
    # frame is less than half a patch — replicate the edge for the rest
    pad_mode = (
        "symmetric"
        if all(d <= s for s, d in zip(frame_spatial, edge_pad))
        else "edge"
    )
    grid = tiling.tile_grid(padded_spatial, tc.patch, tc.overlap)
    # TTA variants are fixed at trace time (checked against the PADDED
    # spatial: the transposed frame must reuse the same tiling grid)
    variants = _tta_variants(nd, tc.tta, padded_spatial)
    fold = cfg.norm == "batch"
    if fold:
        # inference-mode BN folds exactly into the conv weights — removes
        # every BN elementwise pass from the hot graph (models.unet.fold_batchnorm)
        cfg = dataclasses.replace(cfg, norm="none")
    _check_polyphase(tc, cfg)

    # labels-only single-tile serves can skip the softmax entirely:
    # one tile means the stitch is a per-pixel positive rescale of the
    # patch output, and argmax is invariant under it — so argmax of
    # stitched logits == argmax of stitched softmax, bit-identically
    logits_fast = (
        not tc.emit_probs and tc.tta == 1 and tuple(tc.patch) == padded_spatial
    )

    def infer(params, state, frame):
        if fold:
            _, params, state = unet.fold_batchnorm(
                dataclasses.replace(cfg, norm="batch"), params, state
            )
        if frame.ndim == nd:
            frame = frame[..., None]
        x = _normalize(frame, tc)
        if any(edge_pad):
            x = jnp.pad(x, [(0, d) for d in edge_pad] + [(0, 0)], mode=pad_mode)
        def forward(batch):
            if tc.polyphase:
                logits = _polyphase_apply(cfg, params, state, batch)
            else:
                logits, _ = unet.apply(cfg, params, state, batch, train=False)
            return logits if logits_fast else jax.nn.softmax(logits, axis=-1)

        probs = _tta_average(
            lambda xi: tiled_apply(
                forward, xi, grid, padded_spatial, tc, cfg.num_classes
            ),
            x,
            variants,
        )
        if any(edge_pad):
            probs = probs[tuple(slice(0, s) for s in frame_spatial)]
        labels = jnp.argmax(probs, axis=-1).astype(jnp.dtype(tc.labels_dtype))
        if not tc.emit_probs:
            return None, labels
        return probs.astype(jnp.dtype(tc.probs_dtype)), labels

    return jax.jit(infer) if jit else infer


@functools.lru_cache(maxsize=32)
def cached_frame_inferrer(
    cfg: unet.UNetConfig,
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
) -> Callable:
    """Process-wide cache of jitted frame inferrers.

    The server builds an inferrer per job; without this, every job for the
    same (architecture, tiling, frame shape) re-traces and re-jits the full
    fused graph (seconds of host work even with XLA's on-disk compilation
    cache, since tracing happens before the cache is consulted). Keyed on
    the frozen configs + shape — weights are per-call arguments, so one
    cached graph serves every registered model of the same architecture.
    """
    return make_frame_inferrer(cfg, tc, frame_spatial)


@functools.lru_cache(maxsize=32)
def cached_batch_inferrer(
    cfg: unet.UNetConfig,
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    batch: int,
) -> Callable:
    """Jitted inferrer vmapped over a leading frame axis of size ``batch``.

    Small frames are dispatch-bound one at a time (measured on v5e: 256^2
    frames run 501 fps dispatched singly, 1170 fps in batches of 8 —
    BASELINE.md round-2); batching amortizes the per-dispatch host/relay
    cost and fills the MXU with more parallel work. ``batch`` is static —
    callers pad the tail chunk and slice the results.
    """
    single = make_frame_inferrer(cfg, tc, frame_spatial, jit=False)
    return jax.jit(
        lambda params, state, frames: jax.vmap(
            lambda f: single(params, state, f)
        )(frames)
    )


def make_gan_enhancer(
    cfg,  # gan.GANConfig (frozen dataclass), already BN-folded
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
) -> Callable:
    """Un-jitted ``enhance(params, state, frame) -> (H, W, C_out)``.

    The GAN counterpart of ``make_frame_inferrer(jit=False)``: the fused
    normalize -> tiled generator -> stitch chain as a plain traceable
    function, for callers that wrap it themselves (jit, vmap, DP sharding).
    Frames arrive (H, W) single-channel or (H, W, C_in).
    """
    from sequitr_tpu.models import gan as gan_lib

    spatial = tuple(frame_spatial)
    grid = tiling.tile_grid(spatial, tc.patch, tc.overlap)
    nd = len(spatial)
    # TTA averages the ENHANCED maps over the same symmetry variants as
    # segmentation (flip noise-averaging is the classic denoising trick)
    variants = _tta_variants(nd, tc.tta, spatial)
    gcfg = cfg.generator_config
    _check_polyphase(tc, gcfg)

    def enhance_one(params, state, frame):
        if frame.ndim == nd:
            frame = frame[..., None]
        x = _normalize(frame, tc)

        def forward(patches):
            if tc.polyphase:
                y = _polyphase_apply(
                    gcfg, params["gen"], state["gen"], patches
                )
                if cfg.output_activation == "tanh":
                    y = jnp.tanh(y)
                elif cfg.output_activation == "sigmoid":
                    y = jax.nn.sigmoid(y)
                return y
            out, _ = gan_lib.generator_apply(cfg, params, state, patches)
            return out

        out = _tta_average(
            lambda xi: tiled_apply(
                forward, xi, grid, spatial, tc, cfg.out_channels
            ),
            x,
            variants,
        )
        # tc.probs_dtype doubles as the enhanced-map output dtype: float16
        # halves the dominant D2H of a streamed enhancement job (the
        # enhanced frame is 2x the input bytes at f32)
        return out.astype(jnp.dtype(tc.probs_dtype))

    return enhance_one


@functools.lru_cache(maxsize=32)
def cached_gan_enhancer(
    cfg,  # gan.GANConfig (frozen dataclass), already BN-folded
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    batch: Optional[int] = None,
) -> Callable:
    """Cross-job cache of jitted GAN generator passes.

    The GAN analogue of ``cached_frame_inferrer``: keyed on the (folded)
    architecture config + tiling + frame shape, with weights as per-call
    arguments — so a warm server's second enhancement job for the same
    architecture pays zero retrace/recompile (the ~70x warm-server win the
    segmentation path measured in round 2, previously missing here).

    Returns ``enhance(params, state, frame) -> (H, W, C_out)`` for
    ``batch=None``, else the vmapped
    ``enhance(params, state, frames) -> (batch, H, W, C_out)`` form.
    """
    enhance_one = make_gan_enhancer(cfg, tc, frame_spatial)
    if batch is None:
        return jax.jit(enhance_one)
    return jax.jit(
        lambda params, state, frames: jax.vmap(
            lambda f: enhance_one(params, state, f)
        )(frames)
    )


def make_denoiser(
    cfg,  # unet.UNetConfig with a regression head (num_classes = C_out)
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
) -> Callable:
    """Un-jitted ``denoise(params, state, frame) -> (H, W, C_out)``.

    Serving pass for Noise2Void-trained regression U-Nets
    (``train.make_n2v_train_step``): normalize -> tiled forward (raw head,
    NO softmax — the output is the predicted clean intensity in normalized
    space) -> weighted stitch. Mirrors ``make_gan_enhancer``'s contract
    (same tiling/TTA/output-dtype semantics) so the two denoising families
    serve identically; BN folds into the convs like the segmentation path.
    """
    spatial = tuple(frame_spatial)
    grid = tiling.tile_grid(spatial, tc.patch, tc.overlap)
    nd = len(spatial)
    variants = _tta_variants(nd, tc.tta, spatial)
    fold = cfg.norm == "batch"
    run_cfg = dataclasses.replace(cfg, norm="none") if fold else cfg
    _check_polyphase(tc, run_cfg)

    def denoise_one(params, state, frame):
        if fold:
            _, params, state = unet.fold_batchnorm(
                dataclasses.replace(run_cfg, norm="batch"), params, state
            )
        if frame.ndim == nd:
            frame = frame[..., None]
        x = _normalize(frame, tc)

        def forward(patches):
            if tc.polyphase:
                return _polyphase_apply(run_cfg, params, state, patches)
            out, _ = unet.apply(run_cfg, params, state, patches, train=False)
            return out

        out = _tta_average(
            lambda xi: tiled_apply(
                forward, xi, grid, spatial, tc, run_cfg.num_classes
            ),
            x,
            variants,
        )
        return out.astype(jnp.dtype(tc.probs_dtype))

    return denoise_one


@functools.lru_cache(maxsize=32)
def cached_denoiser(
    cfg,  # unet.UNetConfig (frozen dataclass)
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    batch: Optional[int] = None,
) -> Callable:
    """Cross-job cache of jitted N2V denoiser passes (see
    ``cached_gan_enhancer`` for the caching rationale — weights are
    per-call arguments, so one compiled graph serves every registered
    denoiser of the same architecture/tiling/shape)."""
    denoise_one = make_denoiser(cfg, tc, frame_spatial)
    if batch is None:
        return jax.jit(denoise_one)
    return jax.jit(
        lambda params, state, frames: jax.vmap(
            lambda f: denoise_one(params, state, f)
        )(frames)
    )


def make_flows_segmenter(
    cfg,  # unet.UNetConfig with a dims+1-channel regression head
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    n_iter: int = 200,
    step_size: float = 1.0,
    cellprob_threshold: float = 0.5,
    integrator: str = "euler",
) -> Callable:
    """Un-jitted ``segment(params, state, frame) -> (final, prob)``.

    The flow-field instance segmentation serving pass (ops.flows):
    normalize -> tiled forward (raw head: FLOW_SCALE x unit flows + a
    cell-probability logit) -> weighted stitch -> ``follow_flows`` Euler
    integration, ALL inside one jit graph — the only host work left is
    the irregular sink grouping (``ops.flows.group_sinks``). Returns the
    converged positions (*spatial, dims) float32 and the cell
    probability (*spatial) float32. Dimension-generic: a ``dims == 3``
    config with a 3-axis ``frame_spatial`` serves whole volumes
    (trilinear flow integration).

    TTA is not supported here: flow channels are vector fields whose
    flip/transpose inverses must also permute/negate components, and the
    shared ``_tta_average`` averages raw channels. Callers reject
    ``tc.tta != 1`` loudly rather than serving silently-wrong flows.
    """
    from sequitr_tpu.ops import flows as flows_ops

    if cfg.num_classes != cfg.dims + 1:
        raise ValueError(
            f"flows serving needs num_classes == dims + 1 "
            f"({cfg.dims + 1}), got {cfg.num_classes}"
        )
    if tc.tta != 1:
        raise ValueError(
            "tta is unsupported for flow-field serving (vector outputs); "
            "use tta=1"
        )
    if integrator not in ("euler", "doubling"):
        raise ValueError(
            f"integrator must be 'euler' or 'doubling', got {integrator!r}"
        )
    spatial = tuple(frame_spatial)
    grid = tiling.tile_grid(spatial, tc.patch, tc.overlap)
    nd = len(spatial)
    fold = cfg.norm == "batch"
    run_cfg = dataclasses.replace(cfg, norm="none") if fold else cfg
    _check_polyphase(tc, run_cfg)

    def segment_one(params, state, frame):
        if fold:
            _, params, state = unet.fold_batchnorm(
                dataclasses.replace(run_cfg, norm="batch"), params, state
            )
        if frame.ndim == nd:
            frame = frame[..., None]
        x = _normalize(frame, tc)

        def forward(patches):
            if tc.polyphase:
                return _polyphase_apply(run_cfg, params, state, patches)
            out, _ = unet.apply(run_cfg, params, state, patches, train=False)
            return out

        out = tiled_apply(forward, x, grid, spatial, tc, run_cfg.num_classes)
        out = out.astype(jnp.float32)
        flow = out[..., :nd] / flows_ops.FLOW_SCALE
        prob = jax.nn.sigmoid(out[..., nd])
        integrate = (
            flows_ops.follow_flows_doubling
            if integrator == "doubling" else flows_ops.follow_flows
        )
        final = integrate(
            flow, prob > cellprob_threshold, n_iter=n_iter, step=step_size
        )
        return final, prob

    return segment_one


@functools.lru_cache(maxsize=32)
def cached_flows_segmenter(
    cfg,  # unet.UNetConfig (frozen dataclass)
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
    n_iter: int = 200,
    step_size: float = 1.0,
    cellprob_threshold: float = 0.5,
    integrator: str = "euler",
) -> Callable:
    """Cross-job cache of jitted flows serving passes (see
    ``cached_frame_inferrer`` for the rationale — weights are per-call
    arguments, so one compiled graph serves every registered flows model
    of the same architecture/tiling/shape/integration params)."""
    return jax.jit(
        make_flows_segmenter(
            cfg, tc, frame_spatial, n_iter=n_iter, step_size=step_size,
            cellprob_threshold=cellprob_threshold, integrator=integrator,
        )
    )


def make_stars_predictor(
    cfg,  # unet.UNetConfig with a 1 + n_rays channel regression head
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
) -> Callable:
    """Un-jitted ``predict(params, state, frame) -> (prob, dist)``.

    The star-convex serving pass (ops.stardist): normalize -> tiled
    forward (raw head: object-probability logit + per-ray distances) ->
    weighted stitch -> sigmoid/clamp, ALL inside one jit graph. Returns
    the object probability (H, W) float32 and the ray distances
    (H, W, n_rays) float32 (clamped >= 0) — the irregular candidate
    NMS + polygon rasterization stays on host
    (``ops.stardist.instances_from_rays``), the same regular/irregular
    split as the flows family's sink grouping.

    TTA is not supported: ray channels are per-DIRECTION outputs whose
    flip inverses must also permute rays, and the shared ``_tta_average``
    averages raw channels. Callers reject ``tc.tta != 1`` loudly.
    """
    if cfg.dims != 2:
        raise ValueError(
            f"star-convex serving is 2D only (got dims={cfg.dims}); "
            f"volumetric instances are served by the flows family"
        )
    n_rays = cfg.num_classes - 1
    if n_rays < 4 or n_rays % 4:
        raise ValueError(
            f"stars serving needs num_classes == 1 + n_rays with n_rays a "
            f"positive multiple of 4, got num_classes={cfg.num_classes}"
        )
    if tc.tta != 1:
        raise ValueError(
            "tta is unsupported for star-convex serving (per-ray outputs); "
            "use tta=1"
        )
    spatial = tuple(frame_spatial)
    if len(spatial) != 2:
        raise ValueError(f"stars serving takes 2D frames, got {spatial}")
    grid = tiling.tile_grid(spatial, tc.patch, tc.overlap)
    fold = cfg.norm == "batch"
    run_cfg = dataclasses.replace(cfg, norm="none") if fold else cfg
    _check_polyphase(tc, run_cfg)

    def predict_one(params, state, frame):
        if fold:
            _, params, state = unet.fold_batchnorm(
                dataclasses.replace(run_cfg, norm="batch"), params, state
            )
        if frame.ndim == 2:
            frame = frame[..., None]
        x = _normalize(frame, tc)

        def forward(patches):
            if tc.polyphase:
                return _polyphase_apply(run_cfg, params, state, patches)
            out, _ = unet.apply(run_cfg, params, state, patches, train=False)
            return out

        out = tiled_apply(forward, x, grid, spatial, tc, run_cfg.num_classes)
        out = out.astype(jnp.float32)
        prob = jax.nn.sigmoid(out[..., 0])
        dist = jnp.maximum(out[..., 1:], 0.0)
        return prob, dist

    return predict_one


@functools.lru_cache(maxsize=32)
def cached_stars_predictor(
    cfg,  # unet.UNetConfig (frozen dataclass)
    tc: TileConfig,
    frame_spatial: Tuple[int, ...],
) -> Callable:
    """Cross-job cache of jitted star-convex serving passes (see
    ``cached_frame_inferrer`` for the rationale — weights are per-call
    arguments, so one compiled graph serves every registered stars model
    of the same architecture/tiling/shape)."""
    return jax.jit(make_stars_predictor(cfg, tc, frame_spatial))


class _ReadError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def _iter_read_ahead(it: Iterator, depth: int) -> Iterator:
    """Pull items from ``it`` on a daemon thread, up to ``depth`` ahead.

    The serving frame sources read from disk inside ``next()``; without
    this, every disk read serializes against the dispatch loop. A bounded
    queue keeps memory at ``depth`` items while frame t+1's read overlaps
    frame t's H2D + compute. Exceptions in the producer re-raise at the
    consumer's ``next()``. If the CONSUMER abandons the generator (an
    error downstream in a serving loop), the finally-block stops the
    producer — otherwise each failed streaming job would leak a thread
    pinning ``depth`` frame chunks for the life of a long-lived server.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    done = object()

    def _put(item) -> bool:
        """Put unless the consumer has gone away; False = stop."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def produce():
        try:
            for item in it:
                if not _put(item):
                    return
            _put(done)
        except BaseException as e:  # re-raised consumer-side
            _put(_ReadError(e))

    threading.Thread(target=produce, daemon=True, name="frame-reader").start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, _ReadError):
                raise item.exc
            yield item
    finally:
        stop.set()


def stream_frames(
    fn: Callable,
    frames: Iterable[np.ndarray],
    prefetch: int = 2,
    prefetch_host: Optional[Callable] = None,
) -> Iterator:
    """Stream host frames through a per-frame device function, H2D overlapped.

    ``fn(device_frame) -> result`` is dispatched ``prefetch`` frames ahead of
    consumption; jax dispatch is async, so while frame i's graph runs on the
    TPU, frame i+1's host->HBM copy is already in flight — ingest never
    starves the device (SURVEY.md §7 hard part (e)). Disk reads inside the
    ``frames`` iterator run on a reader thread the same distance ahead, so
    ingest IO also overlaps compute. Yields each frame's (still
    device-resident) result in order.

    ``prefetch_host(result)``: called right after each dispatch — callers
    start async D2H (``arr.copy_to_host_async()``) for exactly the outputs
    they will fetch, so frame t's device->host copy overlaps frame t+1's
    compute instead of serializing at ``np.asarray`` time. Selective on
    purpose: a blanket copy would move e.g. unneeded softmax planes.
    """
    frames = _iter_read_ahead(iter(frames), depth=prefetch)
    device = jax.devices()[0]
    queue = []

    def launch(host_frame):
        out = fn(jax.device_put(np.asarray(host_frame), device))
        if prefetch_host is not None:
            prefetch_host(out)
        return out

    # warm the pipeline
    for _ in range(prefetch):
        try:
            queue.append(launch(next(frames)))
        except StopIteration:
            break

    while queue:
        out = queue.pop(0)
        try:
            queue.append(launch(next(frames)))
        except StopIteration:
            pass
        yield out


def infer_stack(
    infer_fn: Callable,
    params,
    state,
    frames: Iterable[np.ndarray],
    prefetch: int = 2,
    fetch_probs: bool = False,
) -> Iterator[InferenceResult]:
    """Stream a timelapse stack through ``infer_fn`` with H2D double-buffering.

    ``infer_fn(params, state, frame) -> (probs, labels)``; see
    ``stream_frames`` for the overlap mechanics. Label maps (and softmax
    maps too when ``fetch_probs``) start their async D2H copy at dispatch,
    so the transfer overlaps the next frame's compute.
    """

    def prefetch_host(out):
        _copy_to_host_async(out[1])
        if fetch_probs:
            _copy_to_host_async(out[0])

    for probs, labels in stream_frames(
        lambda f: infer_fn(params, state, f), frames, prefetch,
        prefetch_host=prefetch_host,
    ):
        yield InferenceResult(probs=probs, labels=labels)


def _copy_to_host_async(arr) -> None:
    try:
        arr.copy_to_host_async()
    except AttributeError:  # non-jax arrays in tests/fallbacks
        pass
