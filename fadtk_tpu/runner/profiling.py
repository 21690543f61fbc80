"""Lightweight per-stage wall-clock profiling.

The reference has no tracing at all (SURVEY.md §5); since the headline metric
here is throughput (audio-sec/sec/chip), the pipeline accumulates per-stage
timings (decode / resample / embed / stats / score) and can report them at the
end of a run. For deep dives, ``jax.profiler.trace`` integration is exposed via
FADTK_TPU_JAX_TRACE=<dir>.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

from ..utils import log

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextmanager
def stage(name: str):
    start = time.perf_counter()
    try:
        yield
    finally:
        _totals[name] += time.perf_counter() - start
        _counts[name] += 1


def report(reset: bool = True) -> dict[str, float]:
    snapshot = dict(_totals)
    if snapshot:
        parts = ", ".join(
            f"{k}={v:.2f}s/{_counts[k]}x" for k, v in sorted(snapshot.items())
        )
        log.info(f"[profile] {parts}")
    if reset:
        _totals.clear()
        _counts.clear()
    return snapshot


@contextmanager
def maybe_jax_trace():
    """Wrap a run in a JAX profiler trace when FADTK_TPU_JAX_TRACE is set."""
    trace_dir = os.environ.get("FADTK_TPU_JAX_TRACE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    log.info(f"[profile] jax trace written to {trace_dir}")
