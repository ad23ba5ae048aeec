"""High-level training loops: records in -> trained checkpoint out.

Rebuilds the reference's per-network training drivers (SURVEY.md §3.2): an
epoch loop over record shards with shuffling, host->device prefetch, the
jit train step, periodic checkpointing and structured metric logging. Works
single-chip or data-parallel over a mesh (pass ``mesh``).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import numpy as np

from sequitr_tpu.data import records as records_lib
from sequitr_tpu.data.prefetch import ShardIterator, prefetch_to_device
from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet
from sequitr_tpu.pipeline import train as train_lib

log = logging.getLogger("sequitr_tpu.fit")

__all__ = ["FitConfig", "fit_unet", "fit_gan", "latest_checkpoint"]


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 1000
    batch_size: int = 8
    checkpoint_every: int = 500
    log_every: int = 50
    seed: int = 0
    shuffle_buffer: int = 512
    prefetch_depth: int = 2


def _decode_seg(payload: bytes) -> Dict[str, np.ndarray]:
    ex = records_lib._decode_seg(payload)
    img = ex.image
    if img.ndim == 2:
        img = img[..., None]
    out = {"image": img.astype(np.float32), "labels": ex.labels.astype(np.int32)}
    if ex.weights is not None:
        out["weights"] = ex.weights.astype(np.float32)
    return out


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recent checkpoint under ``ckpt_dir``: ``final`` if the run
    completed, else the highest periodic ``step_*`` directory (crash/requeue
    recovery — a mid-training crash must not restart from scratch)."""
    final = os.path.join(ckpt_dir, "final")
    if os.path.isdir(final):
        return final
    try:
        steps = sorted(
            n for n in os.listdir(ckpt_dir)
            if n.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, n))
        )
    except FileNotFoundError:
        return None
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def _run_loop(
    state,
    step_fn: Callable,
    batches: Iterable,
    fc: FitConfig,
    ckpt_dir: Optional[str],
    key: jax.Array,
    metric_keys: Sequence[str],
):
    """Drive ``step_fn`` for up to ``fc.steps`` TOTAL steps.

    ``fc.steps`` is the global target: a state restored from a periodic
    checkpoint (``state.step`` > 0) runs only the remaining steps, and
    periodic checkpoints are named by global step so a resumed run never
    rewinds or overwrites earlier progress.
    """
    start = int(jax.device_get(state.step))
    todo = max(0, fc.steps - start)
    t0 = time.time()
    seen = 0
    for i, batch in enumerate(batches):
        if i >= todo:
            break
        g = start + i + 1  # global step after this update
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, g - 1))
        seen += 1
        if g % fc.log_every == 0 or i + 1 == todo:
            vals = {k: float(metrics[k]) for k in metric_keys if k in metrics}
            rate = seen / (time.time() - t0)
            log.info(
                "step %d/%d %s (%.2f steps/s)",
                g,
                fc.steps,
                " ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                rate,
            )
        if ckpt_dir and g % fc.checkpoint_every == 0:
            train_lib.save_checkpoint(os.path.join(ckpt_dir, f"step_{g:08d}"), state)
    if ckpt_dir:
        train_lib.save_checkpoint(os.path.join(ckpt_dir, "final"), state)
    return state


def fit_unet(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.TrainState] = None,
) -> train_lib.TrainState:
    """Train a U-Net from segmentation record shards; returns final state."""
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    step = train_lib.make_unet_train_step(cfg, tc, jit=mesh is None)
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_seg, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer,
    )
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key, ("loss", "accuracy", "grad_norm")
    )


def _decode_pair(payload: bytes) -> Dict[str, np.ndarray]:
    f = records_lib.decode_example(payload)
    shape = tuple(int(v) for v in f["image/shape"])
    x = np.frombuffer(f["input/encoded"][0], dtype="<f4").reshape(shape)
    y = np.frombuffer(f["target/encoded"][0], dtype="<f4").reshape(shape)
    return {"input": x[..., None], "target": y[..., None]}


def encode_pair(x: np.ndarray, y: np.ndarray) -> bytes:
    """Encode a GAN training pair (raw, clean) as a record payload."""
    x = np.asarray(x, np.float32)
    return records_lib.encode_example(
        {
            "input/encoded": x.astype("<f4").tobytes(),
            "target/encoded": np.asarray(y, np.float32).astype("<f4").tobytes(),
            "image/shape": list(x.shape),
        }
    )


def fit_gan(
    cfg: gan_lib.GANConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    init_state: Optional[train_lib.GANTrainState] = None,
    l1_weight: float = 100.0,
) -> train_lib.GANTrainState:
    """Train the enhancement GAN from (input, target) pair shards."""
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_gan_state(key, cfg, tc)
    step = train_lib.make_gan_train_step(cfg, tc, l1_weight=l1_weight)
    it = ShardIterator(
        shard_paths, _decode_pair, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer,
    )
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth)
    return _run_loop(state, step, batches, fc, ckpt_dir, key, ("d_loss", "g_loss"))
