"""Shared honest-timing helpers for the on-chip probe scripts.

The tunneled TPU protocol (CLAUDE.md): block_until_ready can return before
remote completion, so every iteration chains a data dependency through the
previous scalar result, the window ends with a HOST VALUE FETCH, and the
measured trivial-dispatch round-trip is subtracted. bench.py implements the
same protocol for the driver's family sweep; probes import this module so a
future protocol fix lands in one place (the round-3 RTT-burial bug class).

Import from a sibling script:

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_timing import measure_rtt, window_ms
"""

from __future__ import annotations

import time


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure_rtt() -> float:
    """Best-of-5 trivial-dispatch round trip (seconds), fetch-synced."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda a: a + 1.0)
    float(trivial(jnp.float32(0.0)))  # warm/compile
    return min(timed(lambda: float(trivial(jnp.float32(0.0)))) for _ in range(5))


def window_ms(jstep, args, rtt: float, budget_s: float = 0.4, windows: int = 3) -> float:
    """ms per call of ``jstep(acc, *args) -> acc`` via chained windows.

    jstep must thread a data dependency from ``acc`` into its computation and
    return a new scalar acc (see bench.py's `step`); the chain length adapts
    so the window dwarfs the subtracted RTT.
    """
    import jax.numpy as jnp

    zero = jnp.float32(0.0)
    float(jstep(zero, *args))  # warm (fetch-synced)
    est = max(timed(lambda: float(jstep(zero, *args))) - rtt, 1e-4)
    iters = int(min(max(8, budget_s / est), 256))
    best = float("inf")
    for _ in range(windows):
        acc = zero
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = jstep(acc, *args)
        float(acc)  # force true completion of the whole chain
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / iters * 1e3
