"""Whole-model A/B on TPU: whisper with packed-heads flash in the encoder.

Context: whisper kept XLA attention in both dtypes on two measurements
(models/whisper_impl.py:84-91) — but both predate the packed-heads kernel
(ops/flash_attention.py::flash_attention_packed), which fixed the two binds
those measurements hit (128-byte DMA rows and the 4 (B,H,T,D) transposes
around the per-(b,h) kernel; speech call-site bf16 T=499: 7.98 -> 4.74 ms).
Whisper's encoder is the zoo's longest-sequence attention (T=1500), so the
old verdict deserves a re-probe at the model level.

Protocol: chained data dependency + one host value fetch, RTT subtracted
(probe_timing / CLAUDE.md). Whole-model forward (encoder + 2-token decoder),
B=16 — the bench geometry. Only the encoder self-attention (tq == tk,
non-causal) is flashed; the decoder's 2-token self/cross attentions stay XLA.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/whisper_flash_probe.py
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

    import fadtk_tpu.models.whisper_impl as wi
    from fadtk_tpu.models.whisper_impl import (
        config_for_size,
        init_whisper_params,
        whisper_forward,
    )
    from fadtk_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 16}

    orig_attention = wi._attention

    def flash_encoder_attention(p, x, kv, num_heads, causal=False):
        b, tq, d = x.shape
        if causal or kv is not x or tq < 512:
            return orig_attention(p, x, kv, num_heads, causal)
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = kv @ p["k_proj"]["kernel"]
        v = kv @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        o = flash_attention_packed(q, k, v, None, num_heads=num_heads)
        return o @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    for size in ("base", "large"):
        cfg = config_for_size(size)
        params32 = init_whisper_params(cfg, jax.random.PRNGKey(0))
        feats_np = (rng.standard_normal((16, 80, 3000)) * 0.3).astype(np.float32)

        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            params = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
            )
            feats = jnp.asarray(feats_np)

            @jax.jit
            def step(acc, p, f):
                y = whisper_forward(cfg, p, f + acc.astype(f.dtype) * 1e-12)
                return acc + y.astype(jnp.float32).sum()

            wi._attention = orig_attention
            ms_xla = window_ms(step, (params, feats), rtt)

            wi._attention = flash_encoder_attention

            @jax.jit
            def step_fl(acc, p, f):
                y = whisper_forward(cfg, p, f + acc.astype(f.dtype) * 1e-12)
                return acc + y.astype(jnp.float32).sum()

            ms_flash = window_ms(step_fl, (params, feats), rtt)
            wi._attention = orig_attention

            key = f"{size}-{dtype_name}"
            out[key] = {
                "xla_ms": round(ms_xla, 2),
                "flash_ms": round(ms_flash, 2),
                "speedup": round(ms_xla / ms_flash, 3),
            }
            print(json.dumps({key: out[key]}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "whisper_flash_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
