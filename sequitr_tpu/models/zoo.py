"""Named model presets — the rebuilt analogue of sequitr's preconfigured nets.

The reference shipped task-specific network configurations (2D/3D
segmentation variants, the enhancement GAN) selected by name in job specs
(SURVEY.md §2; exact reference names unavailable — these presets are the
rebuild's documented defaults). ``get(name)`` returns a ready config;
``create(name, key)`` also initializes parameters.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet

__all__ = ["PRESETS", "get", "create", "names"]


def _unet(**kw) -> unet.UNetConfig:
    base: Dict[str, Any] = dict(
        in_channels=1, num_classes=3, depth=4, base_features=32,
        norm="batch", compute_dtype=jnp.bfloat16,
    )
    base.update(kw)
    return unet.UNetConfig(**base)


PRESETS: Dict[str, Any] = {
    # binary cell/background segmentation
    "unet2d_binary": _unet(num_classes=2),
    # background / interphase / mitotic — the classic sequitr 3-class task
    "unet2d_3class": _unet(num_classes=3),
    # 5-class cell-state segmentation
    "unet2d_5class": _unet(num_classes=5),
    # volumetric segmentation over z-stacks (shallower: HBM-conscious)
    "unet3d_binary": _unet(num_classes=2, dims=3, depth=3, features_cap=256),
    "unet3d_3class": _unet(num_classes=3, dims=3, depth=3, features_cap=256),
    # pix2pix-style enhancement/denoising GAN
    "gan_enhance": gan_lib.GANConfig(compute_dtype=jnp.bfloat16),
    # FAST variants: space-to-depth x2 input (4x channels at half
    # resolution) with doubled base width — the round-1 conv study showed
    # thin channels bound MXU throughput (BASELINE.md); these trade exact
    # architecture parity for ~2-3x frame rate and must be trained as
    # their own models
    "unet2d_3class_fast": _unet(num_classes=3, space_to_depth=2, base_features=64),
    "unet2d_binary_fast": _unet(num_classes=2, space_to_depth=2, base_features=64),
    # x4 rearrangement (16x input channels at quarter resolution): the
    # fastest family member (measured 2.8x the parity model at 1024^2);
    # distillation evidence: tests/test_fit.py::TestDistillFast
    "unet2d_3class_fast4": _unet(num_classes=3, space_to_depth=4, base_features=64),
    "unet2d_binary_fast4": _unet(num_classes=2, space_to_depth=4, base_features=64),
    # Noise2Void self-supervised denoiser: a regression U-Net (num_classes
    # doubles as the output channel count, raw head — no softmax), trained
    # with blind-spot masking (train.make_n2v_train_step) from NOISY data
    # alone. The N2V literature uses a shallower net than segmentation
    # (receptive field only needs to span the noise correlation length);
    # depth 3 also keeps the serving graph light next to the GAN enhancer.
    "n2v_denoise": _unet(num_classes=1, depth=3, features_cap=256),
    # FAST denoiser: the same space-to-depth trade as the segmentation
    # fast family — and unlike those, it needs NO distillation: the
    # blind-spot loss is self-supervised, so the s2d architecture trains
    # directly on the same noisy data (train_n2v space_to_depth: 2)
    "n2v_denoise_fast": _unet(
        num_classes=1, depth=3, features_cap=256,
        space_to_depth=2, base_features=64,
    ),
    # flow-field instance segmentation (ops.flows, Cellpose-style): a
    # regression U-Net whose head carries (dy, dx) x FLOW_SCALE + a
    # cell-probability logit — num_classes = dims + 1, raw head. The flow
    # representation makes touching-cell boundaries explicit (opposite-
    # sign vectors), which per-pixel class maps cannot express.
    "flows_cells": _unet(num_classes=3),
    # star-convex instance segmentation (ops.stardist, StarDist-style):
    # a regression U-Net whose head carries an object-probability logit
    # + 32 per-ray boundary distances — num_classes = 1 + n_rays, raw
    # head. The polygon prior is the stronger separator for convex
    # nucleus-like shapes; the flows family covers the concave/3D cases.
    "stars_cells": _unet(num_classes=33),
}


def names():
    return sorted(PRESETS)


def get(name: str):
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {names()}")
    return PRESETS[name]


def create(name: str, key: jax.Array) -> Tuple[Any, Any, Any]:
    """(config, params, state) for a named preset."""
    cfg = get(name)
    if isinstance(cfg, gan_lib.GANConfig):
        params, state = gan_lib.init(key, cfg)
    else:
        params, state = unet.init(key, cfg)
    return cfg, params, state
