"""Double-buffered host->HBM streaming and batching.

Replaces the reference's per-``sess.run`` feed with an explicit prefetch
pipeline (SURVEY.md §3.2/§3.3): host arrays are placed on device ``depth``
steps ahead of consumption, so the H2D DMA for step i+1 overlaps the compute
of step i (jax dispatch is async). For sharded consumption pass a
``jax.sharding.Sharding`` and each batch lands pre-sharded over the mesh.
"""

from __future__ import annotations

import collections
import itertools
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["prefetch_to_device", "batch_iterator", "ShardIterator", "load_holdout"]


def prefetch_to_device(
    iterator: Iterable[Any],
    depth: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Yield pytrees from ``iterator`` placed on device ``depth`` items ahead."""
    iterator = iter(iterator)
    put = (
        (lambda x: jax.device_put(x, sharding))
        if sharding is not None
        else jax.device_put
    )
    queue: collections.deque = collections.deque()

    def enqueue(n):
        for item in itertools.islice(iterator, n):
            queue.append(jax.tree.map(lambda a: put(np.asarray(a)), item))

    enqueue(depth)
    while queue:
        yield queue.popleft()
        enqueue(1)


def batch_iterator(
    examples: Sequence[Any],
    batch_size: int,
    key: Optional[np.random.Generator] = None,
    collate: Optional[Callable] = None,
    drop_remainder: bool = True,
) -> Iterator[Any]:
    """Shuffled epoch batching of in-memory examples into stacked pytrees."""
    idx = np.arange(len(examples))
    if key is not None:
        key.shuffle(idx)
    stop = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)
    for start in range(0, stop, batch_size):
        chunk = [examples[i] for i in idx[start : start + batch_size]]
        if collate is not None:
            yield collate(chunk)
        else:
            yield jax.tree.map(lambda *xs: np.stack(xs), *chunk)


class ShardIterator:
    """Infinite epoch iterator over record shards with host-side decode.

    ``decode`` maps a raw record payload to a pytree example; batches are
    stacked and can be fed through ``prefetch_to_device`` for streaming.

    ``holdout_every`` > 0 reserves every k-th example (by position within
    its shard file — a stable, restart-deterministic split) for evaluation:
    the training iterator skips them; ``load_holdout`` collects them.
    """

    def __init__(
        self,
        paths: Sequence[str],
        decode: Callable[[bytes], Any],
        batch_size: int,
        seed: int = 0,
        shuffle_buffer: int = 512,
        holdout_every: int = 0,
    ):
        self.paths = list(paths)
        self.decode = decode
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.shuffle_buffer = shuffle_buffer
        self.holdout_every = holdout_every

    def __iter__(self):
        from sequitr_tpu.data import records

        buf: list = []
        while True:
            order = list(self.paths)
            self.rng.shuffle(order)
            for path in order:
                for i, payload in enumerate(records.read_records(path)):
                    if self.holdout_every and (i + 1) % self.holdout_every == 0:
                        continue  # reserved for the eval split
                    buf.append(self.decode(payload))
                    if len(buf) >= self.shuffle_buffer:
                        self.rng.shuffle(buf)
                        while len(buf) >= self.batch_size:
                            chunk = buf[: self.batch_size]
                            del buf[: self.batch_size]
                            yield jax.tree.map(lambda *xs: np.stack(xs), *chunk)


def load_holdout(
    paths: Sequence[str],
    decode: Callable[[bytes], Any],
    holdout_every: int,
    limit: int = 32,
) -> Optional[Any]:
    """Collect the eval split ``ShardIterator`` skips, stacked as one batch.

    Returns None when the split is empty (too few examples). The split is
    every ``holdout_every``-th example per shard, in deterministic shard
    order, capped at ``limit`` examples. Reserved examples BEYOND the cap
    are still excluded from training (the split rule is positional), so a
    warning is logged when the cap truncates — raise ``limit`` or
    ``holdout_every`` if that data matters.
    """
    import logging

    from sequitr_tpu.data import records

    if holdout_every <= 0:
        return None
    out = []
    truncated = 0
    for path in sorted(paths):
        for i, payload in enumerate(records.read_records(path)):
            if (i + 1) % holdout_every == 0:
                if len(out) >= limit:
                    truncated += 1
                    continue
                out.append(decode(payload))
    if truncated:
        logging.getLogger("sequitr_tpu.data").warning(
            "holdout split has %d examples beyond eval limit %d — they are "
            "excluded from training but never evaluated; raise eval_limit "
            "or holdout_every",
            truncated,
            limit,
        )
    if not out:
        return None
    return jax.tree.map(lambda *xs: np.stack(xs), *out)
