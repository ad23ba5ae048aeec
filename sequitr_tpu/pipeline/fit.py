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
from sequitr_tpu.data.prefetch import ShardIterator, load_holdout, prefetch_to_device
from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet
from sequitr_tpu.pipeline import train as train_lib

log = logging.getLogger("sequitr_tpu.fit")

__all__ = ["FitConfig", "Distill", "fit_unet", "fit_gan", "fit_n2v",
           "fit_unet_spatial", "latest_checkpoint", "encode_image_example"]


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 1000
    batch_size: int = 8
    checkpoint_every: int = 500
    log_every: int = 50
    seed: int = 0
    shuffle_buffer: int = 512
    prefetch_depth: int = 2
    # --- observability (the rebuild's tf.summary equivalent) ---
    # every k-th record example is held out of training for evaluation
    holdout_every: int = 0
    # run holdout eval every N steps (0 = only if holdout_every is set,
    # then defaults to checkpoint_every)
    eval_every: int = 0
    eval_limit: int = 16  # max holdout examples evaluated
    # JSONL stream of per-step train metrics + eval series (None = off)
    metrics_path: Optional[str] = None
    # write the first holdout example's predicted label map alongside the
    # metrics file at each eval (TIFF) — the tf.summary image-dump analogue
    dump_eval_images: bool = False
    # periodic step_* checkpoints kept on disk (oldest pruned after each
    # save; 0 = keep all). "final" and "best" are never pruned — retention
    # bounds long-training disk growth without losing crash-resume.
    keep_checkpoints: int = 3
    # track the named eval metric (higher = better, e.g. "eval_miou" /
    # "eval_psnr") and keep a "best" checkpoint alongside the periodic
    # ones whenever it improves ("" = off; requires holdout_every)
    keep_best_metric: str = ""
    # stop training after this many consecutive evals without a
    # keep_best_metric improvement (0 = off; requires keep_best_metric).
    # The loop still saves "final" and the "best" checkpoint holds the
    # peak — the overfitting guard for long runs.
    early_stop_patience: int = 0
    # exponential moving average of the weights (0 = off; typical 0.999):
    # ema <- decay*ema + (1-decay)*params after every step, initialized
    # at the starting weights (no zero-debias needed). Every checkpoint
    # gets an "ema_<name>" twin, restored on resume; train jobs with
    # ema_decay REGISTER the EMA weights (the classic serving-quality
    # smoothing) while raw weights stay in the ordinary checkpoints.
    ema_decay: float = 0.0


class MetricsLogger:
    """Append-only JSONL metric stream (one object per line, flushed).

    The rebuild's persistent equivalent of the reference's TensorBoard
    scalar summaries (SURVEY.md §5 'Metrics / logging'): each train entry is
    ``{"kind": "train", "step": N, "wall": t, ...metrics}``; eval entries
    use ``kind: "eval"``. JSONL keeps the stream appendable across resumed
    runs and trivially parseable without TF."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._t0 = time.time()

    def write(self, kind: str, step: int, metrics: Dict[str, float]) -> None:
        import json

        rec = {"kind": kind, "step": step, "wall": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def _decode_seg(payload: bytes) -> Dict[str, np.ndarray]:
    ex = records_lib._decode_seg(payload)
    img = ex.image
    # add the channel axis when absent: (H, W) 2D or (Z, H, W) 3D examples
    if img.ndim == ex.labels.ndim:
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
        steps = _step_dirs(ckpt_dir)
    except FileNotFoundError:
        return None
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def _step_dirs(ckpt_dir: str):
    """Sorted periodic ``step_*`` checkpoint directory names (shared by
    resume and retention so their views of the directory cannot drift)."""
    return sorted(
        n for n in os.listdir(ckpt_dir)
        if n.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, n))
    )


def _prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Delete the oldest periodic ``step_*`` checkpoints beyond ``keep``.

    ``final`` and ``best`` are never touched; 0 (or any value < 1 — e.g.
    a typo'd negative job param) disables pruning rather than eating the
    just-saved checkpoint. Bounds disk growth over long training runs
    while keeping the newest periodic checkpoints for crash/requeue
    resume. EMA twins (``ema_step_*``) are pruned with their step."""
    if keep < 1:
        return
    import shutil

    for name in _step_dirs(ckpt_dir)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
        shutil.rmtree(
            os.path.join(ckpt_dir, f"ema_{name}"), ignore_errors=True
        )


def _ema_twin(ckpt_path: str) -> str:
    """Path of a checkpoint's EMA twin (sibling ``ema_<name>`` dir — a
    nested dir inside the orbax tree would corrupt its layout, and a
    ``step_*``-prefixed sibling would be mistaken for a resume point)."""
    return os.path.join(
        os.path.dirname(ckpt_path), f"ema_{os.path.basename(ckpt_path)}"
    )


@jax.jit
def _ema_update(ema, params, decay):
    """One fused device-resident EMA step over the whole params pytree."""
    return jax.tree.map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype),
        ema, params,
    )


def _higher_is_better(metric: str) -> bool:
    """Comparison direction for a keep_best/early-stop metric.

    Loss-like names minimize; everything else (iou, accuracy, psnr)
    maximizes. Before this existed, tracking e.g. ``eval_loss`` silently
    INVERTED: the first (worst) eval became the permanent "best" and
    early stopping fired exactly while the run improved (round-4 N2V
    code-review finding; the trap predated N2V for eval_loss/eval_l1).
    """
    return not metric.endswith(("_loss", "_mse", "_l1", "_rmse", "_bce"))


class TrainingCancelled(RuntimeError):
    """Raised by the fit loop when ``should_stop`` fires.

    Raised AFTER a checkpoint is saved (if a ckpt_dir exists), so a
    cancelled multi-hour training keeps its progress and can be resumed by
    re-submitting the same job (resume-from-newest). The server maps this
    to the job-level ``cancelled`` state (round-4 verdict item 4).
    """


def _run_loop(
    state,
    step_fn: Callable,
    batches: Iterable,
    fc: FitConfig,
    ckpt_dir: Optional[str],
    key: jax.Array,
    metric_keys: Sequence[str],
    eval_fn: Optional[Callable] = None,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    ema_select: Optional[Callable] = None,
):
    """Drive ``step_fn`` for up to ``fc.steps`` TOTAL steps.

    ``fc.steps`` is the global target: a state restored from a periodic
    checkpoint (``state.step`` > 0) runs only the remaining steps, and
    periodic checkpoints are named by global step so a resumed run never
    rewinds or overwrites earlier progress.

    ``eval_fn(state, global_step) -> dict`` (if given) runs every
    ``fc.eval_every`` steps (default: every checkpoint) and once at the end;
    its metrics land in the JSONL stream as ``kind: "eval"`` entries.
    """
    if fc.early_stop_patience and not fc.keep_best_metric:
        raise ValueError(
            "early_stop_patience requires keep_best_metric (the monitored "
            "eval metric)"
        )
    if not 0.0 <= fc.ema_decay < 1.0:
        raise ValueError(
            f"ema_decay={fc.ema_decay} must be in [0, 1)"
        )
    logger = MetricsLogger(fc.metrics_path) if fc.metrics_path else None
    eval_every = fc.eval_every or fc.checkpoint_every
    start = int(jax.device_get(state.step))
    todo = max(0, fc.steps - start)
    ema = None
    if fc.ema_decay:
        # resume: an interrupted EMA run restores the twin of the same
        # checkpoint the state came from; a fresh run (or a checkpoint
        # predating ema_decay) initializes at the current weights.
        # COPIED, not aliased: the train step donates its input state,
        # which would delete buffers the EMA shares with it.
        import jax.numpy as jnp

        # ema_select narrows the averaged subtree to what serving uses
        # (e.g. the GAN generator — averaging the discriminator would
        # double the EMA's HBM footprint for zero serving effect)
        sel = ema_select or (lambda prm: prm)
        ema = jax.tree.map(jnp.copy, sel(state.params))
        if start > 0 and ckpt_dir:
            resumed = latest_checkpoint(ckpt_dir)
            if resumed and os.path.isdir(_ema_twin(resumed)):
                ema = train_lib.restore_checkpoint(
                    _ema_twin(resumed), sel(state.params)
                )

    def save_ckpt(path):
        train_lib.save_checkpoint(path, state)
        if ema is not None:
            train_lib.save_checkpoint(_ema_twin(path), ema)
    t0 = time.time()
    seen = 0

    # seed the best-tracker (and the early-stop staleness counter) from
    # the persistent metric stream so a resumed run (crash/requeue)
    # cannot overwrite a better pre-crash checkpoint with a worse
    # post-resume eval, and cannot forget how long the metric has been
    # stale. Each improving eval writes "eval" then "best", so counting
    # "eval" rows and resetting at each "best" reconstructs staleness.
    best = {"value": None}
    stall = {"n": 0, "stop": False}
    hib = _higher_is_better(fc.keep_best_metric) if fc.keep_best_metric else True

    def _improves(v) -> bool:
        if best["value"] is None:
            return True
        return v > best["value"] if hib else v < best["value"]

    if fc.keep_best_metric and fc.metrics_path and os.path.exists(fc.metrics_path):
        import json

        with open(fc.metrics_path) as mf:
            for line in mf:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if row.get("kind") == "best" and fc.keep_best_metric in row:
                    v = float(row[fc.keep_best_metric])
                    if _improves(v):
                        best["value"] = v
                    if row.get("step", 0) <= start:
                        stall["n"] = 0
                elif (
                    row.get("kind") == "eval"
                    and fc.keep_best_metric in row
                    # evals past the resume checkpoint will be RE-RUN by
                    # this continuation; counting their logged rows too
                    # would double-count them against the patience
                    and row.get("step", 0) <= start
                ):
                    stall["n"] += 1

    def run_eval(g, terminal=False):
        if eval_fn is None:
            return
        ev = {k: float(v) for k, v in eval_fn(state, g).items()}
        log.info("eval @ step %d: %s", g, " ".join(f"{k}={v:.4f}" for k, v in ev.items()))
        if logger:
            logger.write("eval", g, ev)
        m = fc.keep_best_metric
        if m:
            if m not in ev:
                raise ValueError(
                    f"keep_best_metric={m!r} not among eval metrics {sorted(ev)}"
                )
            if _improves(ev[m]):
                best["value"] = ev[m]
                stall["n"] = 0
                if ckpt_dir:
                    save_ckpt(os.path.join(ckpt_dir, "best"))
                log.info("new best %s=%.4f @ step %d", m, ev[m], g)
                if logger:
                    logger.write("best", g, {m: ev[m]})
            else:
                stall["n"] += 1
                if (
                    fc.early_stop_patience
                    and not terminal  # a completed budget is not a stop
                    and stall["n"] >= fc.early_stop_patience
                ):
                    stall["stop"] = True
                    log.info(
                        "early stop @ step %d: no %s improvement in %d "
                        "evals (best %.4f)",
                        g, m, stall["n"], best["value"],
                    )
                    if logger:
                        logger.write(
                            "early_stop", g,
                            {m: ev[m], "best": best["value"],
                             "stale_evals": stall["n"]},
                        )

    try:
        for i, batch in enumerate(batches):
            if i >= todo:
                break
            if should_stop is not None and should_stop():
                # keep the work: checkpoint at the global step reached, then
                # surface the cancellation (a re-submitted job resumes here)
                g = start + i
                if ckpt_dir:
                    save_ckpt(os.path.join(ckpt_dir, f"step_{g:08d}"))
                raise TrainingCancelled(
                    f"training cancelled at step {g}/{fc.steps}"
                )
            g = start + i + 1  # global step after this update
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, g - 1))
            if ema is not None:
                ema = _ema_update(ema, sel(state.params), fc.ema_decay)
            seen += 1
            if progress is not None:
                progress(g, fc.steps)
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
                if logger:
                    logger.write("train", g, dict(vals, steps_per_sec=rate))
            if g % eval_every == 0 and g < fc.steps:
                run_eval(g)
                if stall["stop"]:
                    # early stop: keep the work (final below; "best"
                    # already holds the peak) and end the loop cleanly
                    break
            if ckpt_dir and g % fc.checkpoint_every == 0:
                save_ckpt(os.path.join(ckpt_dir, f"step_{g:08d}"))
                _prune_checkpoints(ckpt_dir, fc.keep_checkpoints)
        if not stall["stop"]:
            run_eval(int(jax.device_get(state.step)), terminal=True)
        if ckpt_dir:
            save_ckpt(os.path.join(ckpt_dir, "final"))
    finally:
        if logger:
            logger.close()
    return state


@dataclasses.dataclass
class Distill:
    """Teacher spec for knowledge-distillation training (fast presets).

    ``alpha`` weights the hard-label CE term; ``1 - alpha`` the soft-target
    KL at ``temperature`` (see ``train.make_unet_distill_step``)."""

    teacher_cfg: unet.UNetConfig
    teacher_params: object
    teacher_state: object
    alpha: float = 0.5
    temperature: float = 2.0


def _dump_dir(fc: FitConfig) -> Optional[str]:
    if fc.dump_eval_images and fc.metrics_path:
        return os.path.dirname(os.path.abspath(fc.metrics_path))
    return None


def _make_unet_evaluator(
    cfg: unet.UNetConfig, fc: FitConfig, shard_paths: Sequence[str]
) -> Optional[Callable]:
    """Holdout evaluator: weighted-CE loss, accuracy, per-class + mean IoU.

    The holdout split is the examples ``ShardIterator`` skips, so eval never
    sees training data. Optionally dumps the first holdout prediction as a
    TIFF per eval — the image-summary analogue."""
    import jax.numpy as jnp

    from sequitr_tpu.ops import losses

    holdout = load_holdout(shard_paths, _decode_seg, fc.holdout_every, fc.eval_limit)
    if holdout is None:
        log.warning("holdout_every=%d produced no eval examples", fc.holdout_every)
        return None
    images = jnp.asarray(holdout["image"])
    labels = jnp.asarray(holdout["labels"])
    weights = jnp.asarray(holdout["weights"]) if "weights" in holdout else None
    dump = _dump_dir(fc)

    @jax.jit
    def _eval(params, model_state):
        logits, _ = unet.apply(cfg, params, model_state, images, train=False)
        loss = losses.weighted_softmax_cross_entropy(logits, labels, weights)
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == labels).astype(jnp.float32))
        per_class = losses.iou(preds, labels, cfg.num_classes)
        return loss, acc, per_class, preds

    def eval_fn(state, g):
        loss, acc, per_class, preds = _eval(state.params, state.model_state)
        out = {
            "eval_loss": loss,
            "eval_accuracy": acc,
            "eval_miou": float(np.mean(np.asarray(per_class))),
        }
        for k, v in enumerate(np.asarray(per_class)):
            out[f"eval_iou_{k}"] = float(v)
        if dump:
            from sequitr_tpu.data import tiff

            tiff.write_stack(
                os.path.join(dump, f"eval_pred_{g:08d}.tif"),
                np.asarray(preds[0]).astype(np.uint16),
            )
        return out

    return eval_fn


def _check_keep_best(fc: FitConfig, known: set) -> None:
    """Reject a typo'd ``keep_best_metric`` BEFORE any training happens.

    The best-tracker only consults the metric at the first eval — up to
    ``eval_every`` steps in — so a bad name would waste that whole stretch
    of training before failing."""
    if fc.keep_best_metric and fc.keep_best_metric not in known:
        raise ValueError(
            f"keep_best_metric={fc.keep_best_metric!r} is not an eval metric "
            f"this trainer produces; choose from {sorted(known)}"
        )


def fit_unet(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.TrainState] = None,
    distill: Optional[Distill] = None,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.TrainState:
    """Train a U-Net from segmentation record shards; returns final state.

    ``distill``: train against a teacher (CE + soft-target KL) — the recipe
    for the space-to-depth fast presets. ``should_stop``: polled every step;
    when it returns True the loop checkpoints and raises TrainingCancelled.
    ``progress(step, total)``: per-step callback (the server's live
    progress.json hook)."""
    _check_keep_best(
        fc,
        {"eval_loss", "eval_accuracy", "eval_miou"}
        | {f"eval_iou_{k}" for k in range(cfg.num_classes)},
    )
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    if distill is not None:
        step = train_lib.make_unet_distill_step(
            cfg, distill.teacher_cfg, tc,
            distill.teacher_params, distill.teacher_state,
            alpha=distill.alpha, temperature=distill.temperature,
            jit=mesh is None,
        )
        metric_keys = ("loss", "ce", "kd", "accuracy", "grad_norm")
    else:
        step = train_lib.make_unet_train_step(cfg, tc, jit=mesh is None)
        metric_keys = ("loss", "accuracy", "grad_norm")
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_seg, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer, holdout_every=fc.holdout_every,
    )
    eval_fn = _make_unet_evaluator(cfg, fc, shard_paths) if fc.holdout_every else None
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key, metric_keys, eval_fn=eval_fn,
        should_stop=should_stop, progress=progress,
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


def _make_gan_evaluator(
    cfg: gan_lib.GANConfig, fc: FitConfig, shard_paths: Sequence[str]
) -> Optional[Callable]:
    """Holdout evaluator for the GAN: generator L1 and PSNR vs targets."""
    import jax.numpy as jnp

    holdout = load_holdout(shard_paths, _decode_pair, fc.holdout_every, fc.eval_limit)
    if holdout is None:
        log.warning("holdout_every=%d produced no eval examples", fc.holdout_every)
        return None
    x = jnp.asarray(holdout["input"])
    y = jnp.asarray(holdout["target"])
    dump = _dump_dir(fc)

    @jax.jit
    def _eval(params, model_state):
        fake, _ = gan_lib.generator_apply(cfg, params, model_state, x)
        fake = fake.astype(jnp.float32)
        l1 = jnp.mean(jnp.abs(fake - y))
        mse = jnp.mean((fake - y) ** 2)
        return l1, mse, fake

    def eval_fn(state, g):
        l1, mse, fake = _eval(state.params, state.model_state)
        # data is [0,1]-normalized, so PSNR peak = 1
        psnr = -10.0 * np.log10(max(float(mse), 1e-12))
        if dump:
            from sequitr_tpu.data import tiff

            tiff.write_stack(
                os.path.join(dump, f"eval_enhanced_{g:08d}.tif"),
                np.asarray(fake[0, ..., 0], dtype=np.float32),
            )
        return {"eval_l1": float(l1), "eval_psnr": psnr}

    return eval_fn


def fit_gan(
    cfg: gan_lib.GANConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.GANTrainState] = None,
    l1_weight: float = 100.0,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.GANTrainState:
    """Train the enhancement GAN from (input, target) pair shards.

    ``mesh``: data-parallel sharding over a device mesh — state replicated,
    the pair batch sharded on its leading axis; XLA inserts the gradient
    all-reduces over ICI (same pattern as ``fit_unet``)."""
    _check_keep_best(fc, {"eval_l1", "eval_psnr"})
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_gan_state(key, cfg, tc)
    step = train_lib.make_gan_train_step(cfg, tc, l1_weight=l1_weight, jit=mesh is None)
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_pair, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer, holdout_every=fc.holdout_every,
    )
    eval_fn = _make_gan_evaluator(cfg, fc, shard_paths) if fc.holdout_every else None
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key, ("d_loss", "g_loss"),
        eval_fn=eval_fn, should_stop=should_stop, progress=progress,
        # serving folds only the generator: averaging the discriminator
        # would double the EMA's footprint for zero effect
        ema_select=lambda prm: prm["gen"],
    )


def _decode_image(payload: bytes) -> Dict[str, np.ndarray]:
    """Decode an image-only example (Noise2Void shards: no labels)."""
    f = records_lib.decode_example(payload)
    shape = tuple(int(v) for v in f["image/shape"])
    x = np.frombuffer(f["image/encoded"][0], dtype="<f4").reshape(shape)
    if x.ndim == 2:
        x = x[..., None]
    return {"image": x.astype(np.float32)}


def encode_image_example(x: np.ndarray) -> bytes:
    """Encode an image-only record payload ((H, W) or (H, W, C) float32)."""
    x = np.asarray(x, np.float32)
    return records_lib.encode_example(
        {"image/encoded": x.astype("<f4").tobytes(), "image/shape": list(x.shape)}
    )


def _make_n2v_evaluator(
    cfg: unet.UNetConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    mask_frac: float,
    radius: int,
    mask_mode: str = "uniform",
    struct=None,
) -> Optional[Callable]:
    """Holdout evaluator for Noise2Void: blind-spot MSE under a FIXED mask.

    Clean targets don't exist (that is the point of N2V), so the eval
    metric is the same masked MSE the training loss minimizes, computed on
    held-out images with a mask drawn once from a fixed key — every eval
    scores the same pixels, so the series is comparable across steps (a
    fresh mask per eval would add sampling noise bigger than late-training
    improvements). ``eval_psnr_masked`` = -10*log10(mse) is the
    higher-is-better form ``keep_best_metric`` wants; it floors at the
    noise variance (the irreducible blind-spot error), so compare runs on
    the SAME data only."""
    import jax.numpy as jnp

    holdout = load_holdout(shard_paths, _decode_image, fc.holdout_every, fc.eval_limit)
    if holdout is None:
        log.warning("holdout_every=%d produced no eval examples", fc.holdout_every)
        return None
    images = jnp.asarray(holdout["image"])
    n_px = int(np.prod(images.shape[1:-1]))
    n_mask = max(1, int(mask_frac * n_px))
    masked, coords = train_lib._n2v_mask_nd(
        jax.random.PRNGKey(0), images, n_mask,
        train_lib._n2v_radii(radius, images.ndim - 2),
        mode=mask_mode, struct=struct,
    )
    dump = _dump_dir(fc)

    @jax.jit
    def _eval(params, model_state):
        pred_m, _ = unet.apply(cfg, params, model_state, masked, train=False)
        mse = train_lib.n2v_masked_mse(pred_m, images, *coords)
        if not dump:  # static: no image dump -> skip the extra forward
            return mse, None
        # the denoised holdout frame for the image dump: UNMASKED input
        pred, _ = unet.apply(cfg, params, model_state, images[:1], train=False)
        return mse, pred

    def eval_fn(state, g):
        mse, pred = _eval(state.params, state.model_state)
        mse = max(float(mse), 1e-12)
        if dump:
            from sequitr_tpu.data import tiff

            tiff.write_stack(
                os.path.join(dump, f"eval_denoised_{g:08d}.tif"),
                np.asarray(pred[0, ..., 0], dtype=np.float32),
            )
        return {
            "eval_n2v_mse": mse,
            "eval_psnr_masked": -10.0 * np.log10(mse),
        }

    return eval_fn


def fit_n2v(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.TrainState] = None,
    mask_frac: float = 0.005,
    radius: int = 5,
    mask_mode: str = "uniform",
    struct=None,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.TrainState:
    """Train a Noise2Void denoiser from image-only record shards.

    Same loop/checkpoint/resume/metrics machinery as ``fit_unet``; the
    step is ``train.make_n2v_train_step`` (blind-spot masked MSE — no
    labels, no clean targets). ``mask_mode``/``struct`` select the N2V2
    median manipulation and structN2V correlated-noise masking; the
    holdout evaluator scores under the SAME manipulation so the metric
    tracks the loss being minimized. ``mesh``: standard DP (state
    replicated, batch sharded; each chip draws its own mask positions
    from the folded-in step key)."""
    _check_keep_best(fc, {"eval_n2v_mse", "eval_psnr_masked"})
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    step = train_lib.make_n2v_train_step(
        cfg, tc, mask_frac=mask_frac, radius=radius,
        mask_mode=mask_mode, struct=struct, jit=mesh is None,
    )
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_image, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer, holdout_every=fc.holdout_every,
    )
    eval_fn = (
        _make_n2v_evaluator(
            cfg, fc, shard_paths, mask_frac, radius,
            mask_mode=mask_mode, struct=struct,
        )
        if fc.holdout_every
        else None
    )
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key, ("loss", "grad_norm"),
        eval_fn=eval_fn, should_stop=should_stop, progress=progress,
    )


def _decode_flow(payload: bytes) -> Dict[str, np.ndarray]:
    """Decode a flows training example (image + flow field + cell prob)."""
    f = records_lib.decode_example(payload)
    ishape = tuple(int(v) for v in f["image/shape"])
    x = np.frombuffer(f["image/encoded"][0], dtype="<f4").reshape(ishape)
    if x.ndim == len(ishape) and x.ndim == 2:
        x = x[..., None]
    nd = x.ndim - 1
    spatial = x.shape[:nd]
    flow = np.frombuffer(f["flow/encoded"][0], dtype="<f4").reshape(
        spatial + (nd,)
    )
    prob = np.frombuffer(f["prob/encoded"][0], dtype="<f4").reshape(spatial)
    return {"image": x.astype(np.float32), "flow": flow, "prob": prob}


def encode_flow_example(
    image: np.ndarray, flow: np.ndarray, prob: np.ndarray
) -> bytes:
    """Encode a flows example: image (*s, C) or (*s), flow (*s, nd),
    prob (*s) — all float32. Flow targets are computed at record-creation
    time (``ops.flows.flow_targets``), the same place the reference
    computes its U-Net weight maps (SURVEY.md §3.2)."""
    image = np.asarray(image, np.float32)
    if image.ndim == flow.ndim - 1:
        image = image[..., None]
    return records_lib.encode_example(
        {
            "image/encoded": image.astype("<f4").tobytes(),
            "flow/encoded": np.asarray(flow, np.float32).astype("<f4").tobytes(),
            "prob/encoded": np.asarray(prob, np.float32).astype("<f4").tobytes(),
            "image/shape": list(image.shape),
        }
    )


def _make_flows_evaluator(
    cfg: unet.UNetConfig, fc: FitConfig, shard_paths: Sequence[str]
) -> Optional[Callable]:
    """Holdout evaluator for flows: flow MSE + prob BCE on held-out
    examples (the training objective on unseen data — ``eval_loss`` is
    the ``keep_best_metric``; instance-level AP needs the full
    follow-and-group pass and belongs to ``evaluate_flows``, not the
    per-eval inner loop)."""
    import optax

    from sequitr_tpu.ops.flows import FLOW_SCALE

    holdout = load_holdout(shard_paths, _decode_flow, fc.holdout_every, fc.eval_limit)
    if holdout is None:
        log.warning("holdout_every=%d produced no eval examples", fc.holdout_every)
        return None
    import jax.numpy as jnp

    x = jnp.asarray(holdout["image"])
    flow = jnp.asarray(holdout["flow"])
    prob = jnp.asarray(holdout["prob"])
    nd = cfg.dims

    @jax.jit
    def _eval(params, model_state):
        out, _ = unet.apply(cfg, params, model_state, x, train=False)
        out = out.astype(jnp.float32)
        flow_mse = jnp.mean((out[..., :nd] - FLOW_SCALE * flow) ** 2)
        prob_bce = jnp.mean(
            optax.sigmoid_binary_cross_entropy(out[..., nd], prob)
        )
        return flow_mse, prob_bce

    def eval_fn(state, g):
        flow_mse, prob_bce = _eval(state.params, state.model_state)
        return {
            "eval_loss": float(flow_mse) + float(prob_bce),
            "eval_flow_mse": float(flow_mse),
            "eval_prob_bce": float(prob_bce),
        }

    return eval_fn


def fit_flows(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.TrainState] = None,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.TrainState:
    """Train a flow-field instance segmenter from flow record shards.

    Same loop/checkpoint/resume/metrics machinery as ``fit_unet``; the
    step is ``train.make_flows_train_step`` (flow MSE + cell-prob BCE,
    vector-aware flip augmentation). ``mesh``: standard DP (state
    replicated, batch sharded on its leading axis)."""
    _check_keep_best(fc, {"eval_loss", "eval_flow_mse", "eval_prob_bce"})
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    step = train_lib.make_flows_train_step(cfg, tc, jit=mesh is None)
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_flow, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer, holdout_every=fc.holdout_every,
    )
    eval_fn = _make_flows_evaluator(cfg, fc, shard_paths) if fc.holdout_every else None
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key,
        ("loss", "flow_mse", "prob_bce", "grad_norm"),
        eval_fn=eval_fn, should_stop=should_stop, progress=progress,
    )


def _decode_stars(payload: bytes) -> Dict[str, np.ndarray]:
    """Decode a star-convex training example (image + ray dists + prob)."""
    f = records_lib.decode_example(payload)
    ishape = tuple(int(v) for v in f["image/shape"])
    n_rays = int(f["dist/n_rays"][0])
    x = np.frombuffer(f["image/encoded"][0], dtype="<f4").reshape(ishape)
    if x.ndim == 2:
        x = x[..., None]
    spatial = x.shape[:2]
    dist = np.frombuffer(f["dist/encoded"][0], dtype="<f4").reshape(
        spatial + (n_rays,)
    )
    prob = np.frombuffer(f["prob/encoded"][0], dtype="<f4").reshape(spatial)
    return {"image": x.astype(np.float32), "dist": dist, "prob": prob}


def encode_stars_example(
    image: np.ndarray, dist: np.ndarray, prob: np.ndarray
) -> bytes:
    """Encode a star-convex example: image (H, W[, C]), dist
    (H, W, n_rays), prob (H, W) — all float32. Ray-distance targets are
    computed at record-creation time (``ops.stardist.star_targets``),
    the same place the reference computes its U-Net weight maps
    (SURVEY.md §3.2)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    return records_lib.encode_example(
        {
            "image/encoded": image.astype("<f4").tobytes(),
            "dist/encoded": np.asarray(dist, np.float32).astype("<f4").tobytes(),
            "prob/encoded": np.asarray(prob, np.float32).astype("<f4").tobytes(),
            "image/shape": list(image.shape),
            "dist/n_rays": [int(dist.shape[-1])],
        }
    )


def _make_stars_evaluator(
    cfg: unet.UNetConfig, fc: FitConfig, shard_paths: Sequence[str]
) -> Optional[Callable]:
    """Holdout evaluator for stars: prob BCE + prob-weighted distance MAE
    on held-out examples (the training objective on unseen data —
    ``eval_loss`` is the ``keep_best_metric``; instance-level AP needs
    the full NMS/rasterize pass and belongs to ``evaluate_flows``-style
    offline scoring, not the per-eval inner loop)."""
    import optax

    holdout = load_holdout(
        shard_paths, _decode_stars, fc.holdout_every, fc.eval_limit
    )
    if holdout is None:
        log.warning("holdout_every=%d produced no eval examples", fc.holdout_every)
        return None
    import jax.numpy as jnp

    x = jnp.asarray(holdout["image"])
    dist = jnp.asarray(holdout["dist"])
    prob = jnp.asarray(holdout["prob"])
    n_rays = cfg.num_classes - 1

    @jax.jit
    def _eval(params, model_state):
        out, _ = unet.apply(cfg, params, model_state, x, train=False)
        out = out.astype(jnp.float32)
        prob_bce = jnp.mean(
            optax.sigmoid_binary_cross_entropy(out[..., 0], prob)
        )
        w = prob[..., None]
        dist_mae = jnp.sum(w * jnp.abs(out[..., 1:] - dist)) / (
            jnp.sum(w) * n_rays + 1e-8
        )
        return dist_mae, prob_bce

    def eval_fn(state, g):
        dist_mae, prob_bce = _eval(state.params, state.model_state)
        return {
            "eval_loss": float(prob_bce)
            + train_lib.STARS_DIST_WEIGHT * float(dist_mae),
            "eval_dist_mae": float(dist_mae),
            "eval_prob_bce": float(prob_bce),
        }

    return eval_fn


def fit_stars(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    shard_paths: Sequence[str],
    ckpt_dir: Optional[str] = None,
    mesh=None,
    init_state: Optional[train_lib.TrainState] = None,
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.TrainState:
    """Train a star-convex instance segmenter from stars record shards.

    Same loop/checkpoint/resume/metrics machinery as ``fit_unet``; the
    step is ``train.make_stars_train_step`` (prob BCE + prob-weighted
    ray-distance MAE, ray-permutation-aware flip augmentation).
    ``mesh``: standard DP (state replicated, batch sharded on its
    leading axis)."""
    _check_keep_best(fc, {"eval_loss", "eval_dist_mae", "eval_prob_bce"})
    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    step = train_lib.make_stars_train_step(cfg, tc, jit=mesh is None)
    sharding = None
    if mesh is not None:
        from sequitr_tpu import parallel

        step = parallel.make_dp_train_step(step, mesh)
        sharding = parallel.batch_sharded(mesh)
    it = ShardIterator(
        shard_paths, _decode_stars, fc.batch_size, seed=fc.seed,
        shuffle_buffer=fc.shuffle_buffer, holdout_every=fc.holdout_every,
    )
    eval_fn = _make_stars_evaluator(cfg, fc, shard_paths) if fc.holdout_every else None
    batches = prefetch_to_device(iter(it), depth=fc.prefetch_depth, sharding=sharding)
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key,
        ("loss", "dist_mae", "prob_bce", "grad_norm"),
        eval_fn=eval_fn, should_stop=should_stop, progress=progress,
    )


def fit_unet_spatial(
    cfg: unet.UNetConfig,
    tc: train_lib.TrainConfig,
    fc: FitConfig,
    batches,
    mesh,
    frame_spatial,
    ckpt_dir: Optional[str] = None,
    init_state: Optional[train_lib.TrainState] = None,
    data_axis: Optional[str] = None,
    space_axis: str = "data",
    should_stop: Optional[Callable[[], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> train_lib.TrainState:
    """Finetune on WHOLE giant frames, rows halo-sharded across the mesh.

    The training counterpart of the ``spatial_parallel`` serving path:
    instead of record patches, each step consumes ``batches`` of full
    (batch, *frame_spatial) frames whose activations would not fit one
    chip's HBM — the step is ``parallel.spatial_train.make_spatial_train_step``
    (halo-exchange convs, psum'd BN batch statistics, one replicated Adam
    update; augmentation must be off — pre-augment on the host if needed).
    Checkpointing, resume, metrics JSONL, cancellation and progress all
    ride the shared ``_run_loop``.
    """
    _check_keep_best(fc, set())
    from sequitr_tpu.parallel import spatial_train

    key = jax.random.PRNGKey(fc.seed)
    state = init_state or train_lib.create_unet_state(key, cfg, tc)
    step = spatial_train.make_spatial_train_step(
        cfg, tc, mesh, tuple(frame_spatial), fc.batch_size,
        space_axis=space_axis, data_axis=data_axis,
    )
    return _run_loop(
        state, step, batches, fc, ckpt_dir, key,
        ("loss", "accuracy", "grad_norm"),
        should_stop=should_stop, progress=progress,
    )
