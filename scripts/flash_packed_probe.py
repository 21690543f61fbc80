"""Isolated A/B on TPU: packed-heads flash vs the per-(b,h) kernel.

Fair comparison at the MODEL call-site boundary: q/k/v start in the
projection layout (B, T, H*D). The per-(b,h) kernel needs the
reshape+transpose to (B, H, T, D) and back (what standard_attention pays);
the packed kernel consumes/produces the projection layout directly with
H*D*itemsize-contiguous DMA rows.

Context (both measured): the grouped all-heads grid was a DEAD END (B=128/
H=12/T=499 bf16: 8.29 vs 7.40 ms — step count was not the bind) and the
kernel's time scales ~linearly in T (7.4 -> 11.3 ms at T 512 -> 768),
pointing at DMA efficiency: per-(b,h) blocks DMA 128-byte rows.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flash_packed_probe.py
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

    from fadtk_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_packed,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    for b, h, t, d in ((128, 12, 499, 64), (128, 12, 749, 64), (128, 16, 499, 64)):
        hd = h * d
        nv = jnp.full((b,), t, jnp.int32)
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            q = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, dt)
            k = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, dt)
            v = jnp.asarray(rng.standard_normal((b, t, hd)) * 0.3, dt)

            def via_bhtd(q, k, v, nv):
                # What standard_attention pays today: split + transpose, the
                # per-(b,h) kernel, transpose + merge back.
                qh, kh, vh = (
                    x.reshape(b, t, h, d).transpose(0, 2, 1, 3) for x in (q, k, v)
                )
                o = flash_attention(qh, kh, vh, nv, grouped=False)
                return o.transpose(0, 2, 1, 3).reshape(b, t, hd)

            def packed(q, k, v, nv):
                return flash_attention_packed(q, k, v, nv, num_heads=h)

            res = {}
            for name, fn in (("bhtd+transposes", via_bhtd), ("packed", packed)):
                @jax.jit
                def step(acc, q, k, v, nv, fn=fn):
                    qq = (q.astype(jnp.float32) * (1.0 + acc * 1e-30)).astype(q.dtype)
                    return acc + fn(qq, k, v, nv).astype(jnp.float32).sum()

                try:
                    res[name] = round(window_ms(step, (q, k, v, nv), rtt), 2)
                except Exception as e:
                    res[name] = f"FAILED: {e}"[:200]
            key = f"B{b}_H{h}_T{t}_{dtype_name}"
            out[key] = res
            print(json.dumps({key: res}), flush=True)

    path = os.path.join(
        os.path.dirname(__file__), "..", ".bench_cache", "flash_packed.json"
    )
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
