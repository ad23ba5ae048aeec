"""Runtime utilities: backend pinning, profiling traces, phase timing.

Covers the rebuild's tracing/metrics subsystem (SURVEY.md §5): the
reference's observability was TensorBoard summaries; here we expose
``jax.profiler`` traces (viewable in XProf/Perfetto) plus lightweight
structured phase timers that server pipelines embed in job status.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

log = logging.getLogger("sequitr_tpu.utils")

__all__ = ["force_cpu", "trace", "PhaseTimer"]


def force_cpu() -> None:
    """Pin jax to the CPU backend, even where a sitecustomize/plugin has
    force-registered an accelerator platform (overrides JAX_PLATFORMS)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (XProf/Perfetto) around a block.

    Robust to a stale trace left active by an abandoned thread (e.g. a
    watchdog-timed-out profiled job): a failed start stops the stale trace
    and retakes the profiler, and a failed stop (someone else already
    stopped it) never masks the block's own result.
    """
    import jax

    try:
        jax.profiler.start_trace(log_dir)
    except Exception:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


class PhaseTimer:
    """Accumulate wall-clock per named phase; render a compact dict.

    >>> t = PhaseTimer()
    >>> with t.phase("normalize"): ...
    >>> t.summary()  # {"normalize_s": 0.12, ...}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {f"{k}_s": round(v, 4) for k, v in self._acc.items()}

    def rate(self, name: str, items: int) -> Optional[float]:
        """items/sec for a phase (None if the phase never ran)."""
        if self._acc.get(name):
            return items / self._acc[name]
        return None
