"""Isolated-attention A/B for the flash kernel's fast-math knobs on TPU.

Variants, at the speech bench geometry (B=128, H=12, d=64):
- bf16: kernel base vs fast_exp (bf16 VPU exp, ~1.8x the f32 exp rate —
  micro-probed 694 vs 1272 G-exp/s on v5e).
- f32: the XLA attention core (materializes (B,H,T,T), DEFAULT-precision
  dots) vs kernel base (Mosaic full-precision f32 MXU passes) vs kernel
  fast_dot (bf16 multiplies + f32 accumulation = XLA DEFAULT semantics).

T=499 (16 kHz 10 s bucket) and T=749 (24 kHz). Timing: chained data
dependency, one host value fetch, RTT subtracted (CLAUDE.md protocol).

CAUTION (CLAUDE.md): isolated-kernel wins do not transfer automatically —
any default flip needs the whole-model A/B (bench.py families) first.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flash_fastmath_probe.py
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

    def xla_core(q, k, v, nv):
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum(
            "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
        )
        mask = jnp.arange(q.shape[2])[None, :] < nv[:, None]
        logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", w, v, preferred_element_type=jnp.float32)

    b, h, d = 128, 12, 64
    rng = np.random.default_rng(0)
    rtt = measure_rtt()

    out = {"rtt_ms": round(rtt * 1e3, 2), "geometry": f"B={b} H={h} d={d}"}
    for t in (499, 749):
        base = rng.standard_normal((b, h, t, d)) * 0.3
        nv = jnp.full((b,), t, jnp.int32)
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            q = jnp.asarray(base, dt)
            k = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, dt)
            v = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, dt)

            def mk(fn):
                @jax.jit
                def step(acc, q, k, v, nv):
                    qq = (q.astype(jnp.float32) * (1.0 + acc * 1e-30)).astype(q.dtype)
                    return acc + fn(qq, k, v, nv).astype(jnp.float32).sum()

                return step

            cases = {"flash": partial(flash_attention, interpret=False)}
            if dt == jnp.bfloat16:
                cases["flash_fast_exp"] = partial(
                    flash_attention, interpret=False, fast_exp=True
                )
            else:
                cases["xla"] = xla_core
                cases["flash_fast_dot"] = partial(
                    flash_attention, interpret=False, fast_dot=True
                )
                cases["flash_fast_dot_exp"] = partial(
                    flash_attention, interpret=False, fast_dot=True, fast_exp=True
                )
            for name, fn in cases.items():
                key = f"T{t}_{dtype_name}_{name}_ms"
                try:
                    out[key] = round(window_ms(mk(fn), (q, k, v, nv), rtt), 3)
                except Exception as e:  # keep probing
                    out[key] = f"ERR {str(e)[:120]}"
                print(f"# {key}: {out[key]}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
