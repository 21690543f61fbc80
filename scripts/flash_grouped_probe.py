"""Isolated A/B: grouped (all-heads-per-step) vs per-(b,h) flash grid on TPU.

The ungrouped kernel's measured bind is per-grid-step pipeline overhead
(~6 of 7.4 ms at B=128/H=12/T=499 bf16 across 1536 steps — see
ops/flash_attention.py docstring). The grouped grid runs b steps with an
in-kernel head loop. Geometries: the speech bench shape (B=128, H=12, T=499,
d=64), the 24 kHz bucket (T=749), and w2v2-large heads (H=16).

CAUTION (CLAUDE.md): an isolated win still needs the whole-model A/B
(bench.py families) before any default stays flipped.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flash_grouped_probe.py
"""

from __future__ import annotations

import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt, window_ms  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    for b, h, t, d in ((128, 12, 499, 64), (128, 12, 749, 64), (128, 16, 499, 64)):
        base = rng.standard_normal((b, h, t, d)) * 0.3
        nv = jnp.full((b,), t, jnp.int32)
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            q = jnp.asarray(base, dt)
            k = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, dt)
            v = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, dt)

            res = {}
            for name, fn in (
                ("ungrouped", partial(flash_attention, interpret=False, grouped=False)),
                ("grouped", partial(flash_attention, interpret=False, grouped=True)),
            ):
                @jax.jit
                def step(acc, q, k, v, nv, fn=fn):
                    qq = (q.astype(jnp.float32) * (1.0 + acc * 1e-30)).astype(q.dtype)
                    return acc + fn(qq, k, v, nv).astype(jnp.float32).sum()

                try:
                    res[name] = round(window_ms(step, (q, k, v, nv), rtt), 2)
                except Exception as e:
                    res[name] = f"FAILED: {e}"[:160]
            key = f"B{b}_H{h}_T{t}_{dtype_name}"
            out[key] = res
            print(json.dumps({key: res}), flush=True)

    path = os.path.join(
        os.path.dirname(__file__), "..", ".bench_cache", "flash_grouped.json"
    )
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
