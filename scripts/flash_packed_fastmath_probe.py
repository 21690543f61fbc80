"""fast_exp / fast_dot on the PACKED flash kernel (TPU, speech geometry).

The original fast-math probes ran on the per-(b,h) kernel and found nothing
(7.39 -> 7.40 ms): that kernel was DMA-row-width bound, so VPU work hid
under the transfers. The packed-heads kernel removed the DMA bind
(4.74 ms at the same geometry), which may have exposed the f32 exp and the
f32 logit dots. Re-probe both knobs isolated at the call-site boundary and
the winner (if any) whole-model.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flash_packed_fastmath_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt, window_ms  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    b, h, t, d = 128, 12, 499, 64
    hd = h * d
    nv = jnp.full((b,), t, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, jnp.bfloat16)

    for name, kw in (
        ("plain", {}),
        ("fast_exp", {"fast_exp": True}),
        ("fast_dot", {"fast_dot": True}),
        ("both", {"fast_exp": True, "fast_dot": True}),
    ):
        @jax.jit
        def step(acc, q, k, v, nv):
            o = flash_attention_packed(
                q + acc.astype(q.dtype) * 1e-12, k, v, nv, num_heads=h, **kw
            )
            return acc + o.astype(jnp.float32).sum()

        out[name] = round(window_ms(step, (q, k, v, nv), rtt), 3)
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "flash_packed_fastmath.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
