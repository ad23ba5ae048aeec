"""pix2pix-style GAN for image enhancement/denoising.

sequitr's enhancement pass is a conditional GAN: a U-Net-like generator maps
a raw fluorescence patch to an enhanced one, and a patch discriminator
scores (input, output) pairs (SURVEY.md §2 'GAN (pix2pix-style)', §3.4).
Reference source unavailable — the architecture below is the pix2pix paper's
(U-Net generator, 70x70 PatchGAN discriminator, adversarial + L1 objective)
and every choice is a documented spec decision.

TPU-first: the generator reuses the functional U-Net core (NHWC, bf16
compute / f32 accumulation); the discriminator is a strided-conv stack that
lowers entirely onto the MXU. Both are pure functions of pytree params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sequitr_tpu.models import unet
from sequitr_tpu.models.unet import _conv, _init_conv  # shared primitives

Params = Dict[str, Any]
State = Dict[str, Any]

__all__ = [
    "GANConfig",
    "init",
    "generator_apply",
    "discriminator_apply",
    "fold_generator",
]


@dataclasses.dataclass(frozen=True)
class GANConfig:
    in_channels: int = 1
    out_channels: int = 1
    gen_depth: int = 4
    gen_base_features: int = 32
    disc_layers: int = 3  # strided conv layers => 70x70-receptive-field PatchGAN
    disc_base_features: int = 64
    compute_dtype: Any = jnp.bfloat16
    # "sigmoid" | "tanh" | "linear". Default sigmoid: the server's pair
    # builder and enhancement pipeline normalize data to [0, 1], so the
    # generator's range must match (pix2pix's tanh convention assumes
    # [-1, 1]-scaled data, which this pipeline does not use).
    output_activation: str = "sigmoid"
    # generator norm layer; training uses "batch", inference-serving paths
    # fold it into the conv weights via ``fold_generator`` (=> "none")
    gen_norm: str = "batch"

    @property
    def generator_config(self) -> unet.UNetConfig:
        return unet.UNetConfig(
            in_channels=self.in_channels,
            num_classes=self.out_channels,
            depth=self.gen_depth,
            base_features=self.gen_base_features,
            norm=self.gen_norm,
            compute_dtype=self.compute_dtype,
        )

    @property
    def min_input_multiple(self) -> int:
        return max(
            self.generator_config.min_input_multiple, 2**self.disc_layers
        )


# ---------------------------------------------------------------------------


def _leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def init(key: jax.Array, cfg: GANConfig) -> Tuple[Params, State]:
    """Initialize {'gen': ..., 'disc': ...} params and generator BN state."""
    kg, kd = jax.random.split(key)
    gen_params, gen_state = unet.init(kg, cfg.generator_config)

    disc: Params = {"convs": []}
    c_in = cfg.in_channels + cfg.out_channels  # conditional: concat(x, y)
    keys = jax.random.split(kd, cfg.disc_layers + 2)
    c = cfg.disc_base_features
    for i in range(cfg.disc_layers):
        disc["convs"].append(_init_conv(keys[i], 4, c_in, c, dims=2))
        c_in, c = c, min(c * 2, 512)
    disc["penultimate"] = _init_conv(keys[-2], 4, c_in, c, dims=2)
    disc["head"] = _init_conv(keys[-1], 4, c, 1, dims=2)

    return {"gen": gen_params, "disc": disc}, {"gen": gen_state}


def generator_apply(
    cfg: GANConfig, params: Params, state: State, x: jnp.ndarray, train: bool = False
) -> Tuple[jnp.ndarray, State]:
    """Enhance ``x`` (N, H, W, C_in) -> (N, H, W, C_out), float32."""
    y, new_gen_state = unet.apply(
        cfg.generator_config, params["gen"], state["gen"], x, train=train
    )
    if cfg.output_activation == "tanh":
        y = jnp.tanh(y)
    elif cfg.output_activation == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y, {"gen": new_gen_state}


def discriminator_apply(
    cfg: GANConfig, params: Params, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Patch logits for the conditional pair (input ``x``, output ``y``).

    Returns (N, H', W', 1) float32 — one logit per receptive-field patch
    (PatchGAN). No normalization layers in the discriminator (spec decision:
    keeps it stateless; pix2pix ablations show minor impact at this scale).
    """
    ccfg = cfg.generator_config  # borrow dims/compute dtype for _conv
    h = jnp.concatenate([x, y], axis=-1)
    for p in params["disc"]["convs"]:
        h = _leaky_relu(_conv(h, p, ccfg, stride=2))
    h = _leaky_relu(_conv(h, params["disc"]["penultimate"], ccfg, stride=1))
    return _conv(h, params["disc"]["head"], ccfg, stride=1).astype(jnp.float32)


def fold_generator(
    cfg: GANConfig, params: Params, state: State
) -> Tuple[GANConfig, Params, State]:
    """Fold the generator's inference-mode batch norm into its conv weights.

    Numerically identical to the unfolded generator at inference (see
    ``models.unet.fold_batchnorm``) and removes every BN elementwise pass
    (plus its float32 activation materialization) from the serving graph —
    the segmentation path has always folded; this brings the GAN pass to
    parity. Returns an equivalent ``gen_norm='none'`` triple; discriminator
    params pass through untouched.
    """
    if cfg.gen_norm != "batch":
        return cfg, params, state
    gcfg = cfg.generator_config
    _, gen_params, gen_state = unet.fold_batchnorm(
        gcfg, params["gen"], state["gen"]
    )
    folded_cfg = dataclasses.replace(cfg, gen_norm="none")
    folded_params = dict(params)
    folded_params["gen"] = gen_params
    return folded_cfg, folded_params, {"gen": gen_state}
