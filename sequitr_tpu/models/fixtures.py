"""Committed trained-checkpoint fixtures.

``bench.py``'s fidelity measurements (round-4 verdict lead item) need
*trained* weights: random-init argmax maps are near-constant, so an
"mIoU of the TPU path vs the CPU-f32 reference" computed on them would be
degenerate. The checkpoints under ``sequitr_tpu/fixtures/`` are trained on
the deterministic synthetic scenes (``data/synthetic.py``) by
``tools/make_fixtures.py`` and committed as float16 flat npz in the
import/export-model interchange layout (param paths + ``state/`` prefix
for batch-norm running statistics — ``models/convert.py``).

float16 storage halves the repo cost; both the TPU and CPU fidelity paths
load the *same* rounded values, so the comparison stays exact-on-identical-
weights (the BASELINE.json fidelity bar). ``manifest.json`` records each
fixture's architecture, training recipe, and achieved holdout metrics.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

from sequitr_tpu.models import convert as convert_lib
from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet

__all__ = ["fixture_dir", "names", "load", "save", "manifest"]

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "fixtures")


def fixture_dir() -> str:
    return os.path.abspath(_DIR)


def _manifest_path() -> str:
    return os.path.join(fixture_dir(), "manifest.json")


def manifest() -> Dict[str, Any]:
    path = _manifest_path()
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def names():
    return sorted(manifest())


def _cfg_from_dict(kind: str, cfg_dict: Dict[str, Any]):
    import jax.numpy as jnp

    cfg_dict = dict(cfg_dict)
    cfg_dict["compute_dtype"] = jnp.dtype(cfg_dict["compute_dtype"])
    cls = {
        "unet": unet.UNetConfig,
        "gan": gan_lib.GANConfig,
        "n2v": unet.UNetConfig,  # regression U-Net (Noise2Void denoiser)
        "flows": unet.UNetConfig,  # regression U-Net (flow-field head)
        "stars": unet.UNetConfig,  # regression U-Net (1 + n_rays head)
    }[kind]
    return cls(**cfg_dict)


def load(name: str, compute_dtype=None) -> Tuple[str, Any, Any, Any, Dict[str, Any]]:
    """Load a committed fixture: ``(kind, cfg, params, state, meta)``.

    ``compute_dtype`` overrides the stored compute dtype (bench loads the
    same weights once as bf16 for the TPU path and once as f32 for the CPU
    reference path). Weights come back as float32 pytrees regardless — the
    compute dtype only affects the cast inside ``apply``.
    """
    meta = manifest().get(name)
    if meta is None:
        raise KeyError(f"unknown fixture {name!r}; available: {names()}")
    kind = meta["kind"]
    cfg = _cfg_from_dict(kind, meta["config"])
    if compute_dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    init = gan_lib.init if kind == "gan" else unet.init
    t_params, t_state = init(jax.random.PRNGKey(0), cfg)
    npz = os.path.join(fixture_dir(), f"{name}.npz")
    params = convert_lib.load_npz_weights(
        npz, t_params, name_map=lambda n: None if n.startswith("state/") else n
    )
    state = convert_lib.load_npz_weights(
        npz, t_state,
        name_map=lambda n: n[len("state/"):] if n.startswith("state/") else None,
    )
    return kind, cfg, params, state, meta


def save(name: str, kind: str, cfg, params, state, meta: Dict[str, Any]) -> str:
    """Persist a fixture as float16 npz + manifest entry (tooling side)."""
    os.makedirs(fixture_dir(), exist_ok=True)
    flat = {
        k: np.asarray(v).astype(np.float16)
        for k, v in convert_lib.flatten_params(params).items()
    }
    # BN running statistics stay float32: running_var spans ~1e-4..1e4 and
    # the normalizer divides by it, so float16 rounding there is the one
    # place a storage cast could visibly move outputs
    flat.update({
        f"state/{k}": np.asarray(v)
        for k, v in convert_lib.flatten_params(state).items()
    })
    path = os.path.join(fixture_dir(), f"{name}.npz")
    np.savez_compressed(path, **flat)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["compute_dtype"] = str(np.dtype(cfg.compute_dtype).name)
    entry = {"kind": kind, "config": cfg_dict, **meta}
    data = manifest()
    data[name] = entry
    tmp = _manifest_path() + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path())
    return path
