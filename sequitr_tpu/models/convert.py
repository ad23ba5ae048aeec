"""Reference-weight conversion: external checkpoints -> sequitr_tpu pytrees.

The parity bar requires running *identical* weights through the reference
and the TPU path (BASELINE.json; SURVEY.md §5 'Checkpoint / resume': "a
TF->jax weight converter so parity runs use identical reference weights").
The interchange format is a flat ``.npz``: export reference variables to
npz (a 5-line TF script, documented below), then load here. For in-process
parity against the re-derived TF architecture, see
``sequitr_tpu.models.tf_reference`` (injects our pytrees directly into a
Keras clone).

Interchange conventions
-----------------------
* Every parameter has a flat path name: our canonical naming is the pytree
  path joined with '/', e.g. ``enc/0/conv1/w``, ``dec/1/bn2/scale``,
  ``up/0/w``, ``head/b``.
* Conv kernels: TF 1.x ``tf.layers.conv2d`` kernels are already HWIO — the
  layout jax uses — so they pass through unchanged. torch kernels (OIHW)
  need ``torch_kernel_to_jax``.
* Transposed-conv kernels: TF ``conv2d_transpose`` stores [kh, kw, c_out,
  c_in]; jax ``lax.conv_transpose`` with HWIO expects [kh, kw, c_in,
  c_out] — use ``tf_transpose_kernel_to_jax``.
* Batch-norm: TF gamma/beta/moving_mean/moving_variance map to our
  scale/bias and state mean/var.

Export snippet for the reference side (run where TF 1.x exists)::

    reader = tf.train.NewCheckpointReader(ckpt_path)
    np.savez(out, **{name.replace(':0',''): reader.get_tensor(name)
                     for name in reader.get_variable_to_shape_map()})
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import jax
import numpy as np

__all__ = [
    "flatten_params",
    "unflatten_like",
    "load_npz_weights",
    "tf_transpose_kernel_to_jax",
    "torch_kernel_to_jax",
    "torch_transpose_kernel_to_jax",
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    """Pytree -> {canonical/flat/path: array} (the npz export format)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[_path_str(path)] = np.asarray(leaf)
    return flat


def unflatten_like(template: Any, flat: Mapping[str, np.ndarray]) -> Any:
    """{path: array} -> pytree with the structure (and dtypes) of ``template``.

    Every template leaf must be present in ``flat`` with a matching shape;
    raises KeyError/ValueError listing what is missing or mismatched.
    """
    paths = jax.tree_util.tree_flatten_with_path(template)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    problems = []
    for (path, leaf), _ in zip(paths[0], leaves):
        name = _path_str(path)
        if name not in flat:
            problems.append(f"missing: {name} {tuple(np.shape(leaf))}")
            new_leaves.append(leaf)
            continue
        arr = np.asarray(flat[name])
        if arr.shape != tuple(np.shape(leaf)):
            problems.append(
                f"shape mismatch at {name}: got {arr.shape}, want {tuple(np.shape(leaf))}"
            )
            new_leaves.append(leaf)
            continue
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    if problems:
        raise ValueError("weight conversion failed:\n  " + "\n  ".join(problems))
    return jax.tree_util.tree_unflatten(paths[1], new_leaves)


def load_npz_weights(
    npz_path: str,
    template: Any,
    name_map: Optional[Callable[[str], Optional[str]]] = None,
    kernel_map: Optional[Callable[[str, np.ndarray], np.ndarray]] = None,
) -> Any:
    """Load a flat npz of reference weights into ``template``'s structure.

    ``name_map``: external name -> canonical path (None = drop the entry);
    identity by default. ``kernel_map``: per-entry array transform (e.g.
    ``tf_transpose_kernel_to_jax`` on ``up/*`` kernels).
    """
    raw = np.load(npz_path)
    flat: Dict[str, np.ndarray] = {}
    for name in raw.files:
        target = name_map(name) if name_map else name
        if target is None:
            continue
        arr = raw[name]
        if kernel_map is not None:
            arr = kernel_map(target, arr)
        flat[target] = arr
    return unflatten_like(template, flat)


def tf_transpose_kernel_to_jax(w: np.ndarray) -> np.ndarray:
    """TF conv*_transpose kernel [k..., c_out, c_in] -> jax HWIO [k..., c_in, c_out]."""
    axes = list(range(w.ndim))
    axes[-2], axes[-1] = axes[-1], axes[-2]
    return np.transpose(w, axes)


def torch_kernel_to_jax(w: np.ndarray) -> np.ndarray:
    """torch conv kernel [c_out, c_in, k...] -> jax [k..., c_in, c_out]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def torch_transpose_kernel_to_jax(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose kernel [c_in, c_out, k...] -> jax [k..., c_in, c_out]."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (0, 1))
