"""Measure the tunneled host<->device link: RTT, host->device (put) and
device->host (fetch) bandwidth at a few transfer sizes.

The e2e pipeline numbers (bench.py --e2e, PERF.md §4) are host+link bound on
this box; this probe pins the link term so cross-round swings in those
numbers can be attributed (the tunnel's speed varies round to round — round 2
measured ~44 MB/s, round 4 re-measures below). Honest protocol: every put is
followed by a device reduction whose VALUE is fetched (block_until_ready is
not sufficient on axon), and the trivial-dispatch RTT is measured separately.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/link_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    reduce_fn = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    reps = 3  # best-of-N for the fetch side (each rep is one whole transfer)

    for mb in (1, 4, 16):
        n = mb * (1 << 20) // 2  # int16 elements
        host = np.ones((n,), np.int16)
        # Warm the executable shape.
        float(reduce_fn(jnp.asarray(host)))

        # put: CHAINED window of k distinct puts, each consumed by a device
        # reduction threaded through an accumulator, ONE value fetch at the
        # end, one RTT subtracted. (Round 4 timed a single 1 MB put minus
        # 2*RTT and published put_1MB_MBps = 1e9 — the put pipelines under
        # the dispatch round-trip, so the subtraction went negative and the
        # clamp fabricated an impossible rate. A multi-put window dwarfs the
        # RTT instead of racing it.)
        reduce_acc = jax.jit(lambda acc, x: acc + jnp.sum(x, dtype=jnp.float32))
        k = max(4, 32 // mb)  # >= ~32 MB per window
        hosts = [np.full((n,), (i % 7) + 1, np.int16) for i in range(k)]
        float(reduce_acc(jnp.float32(0.0), jnp.asarray(hosts[0])))  # warm
        best_put = float("inf")
        for w in range(3):
            for h in hosts:
                h[0] = w + 1  # defeat any client-side buffer dedup/caching
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for h in hosts:
                acc = reduce_acc(acc, jnp.asarray(h))
            float(acc)  # one fetch syncs every put + reduction
            best_put = min(best_put, time.perf_counter() - t0)
        put_s = max(best_put - rtt, 1e-9)
        out[f"put_{mb}MB_MBps"] = round(k * mb / put_s, 1)

        # fetch: device array -> host values. The array must be device-
        # PRODUCED: the axon client retains host-side copies of committed
        # put buffers (the known RAM-leak behavior), so fetching back an
        # array made by jnp.asarray(host) measures a local memcpy, not the
        # link (first revision of this probe reported "infinite" fetch BW).
        produce = jax.jit(lambda s: jnp.full((n,), s, jnp.int16))
        best_get = float("inf")
        for r in range(reps):
            # Fresh device-produced array per rep: the first np.asarray of a
            # given buffer may populate a client-side copy, making later
            # fetches of the SAME buffer local.
            d = produce(jnp.int16(r + 1))
            float(reduce_fn(d))  # sync: production finished remotely
            t0 = time.perf_counter()
            h = np.asarray(d)
            best_get = min(best_get, time.perf_counter() - t0)
        assert h.shape == host.shape
        get_s = max(best_get - rtt, 1e-9)
        out[f"fetch_{mb}MB_MBps"] = round(mb / get_s, 1)
        print(json.dumps({k: v for k, v in out.items() if f"{mb}MB" in k}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "link.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
