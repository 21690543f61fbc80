"""Whole-model A/B: one-pass f32-accumulated LayerNorm moments in the HTSAT
tower (bf16 mode).

Motivation: the round-5 attention ledger (ATTENTION_LEDGER_r05.json) puts
LayerNorm at 0.57 of CLAP's 3.72 ms bf16 forward — the tower's LARGEST
measured VPU item (softmax is 0.44). EnCodec-48k's per-conv group norm won
+26% from the same transform (one-pass E[y²]−E[y]² moments with f32
accumulation, bf16 mode only — the f32 parity path keeps two-pass because
the cancellation costs 1.4e-2 there, PERF.md §3.2).

Measures full CLAP bf16 forward with the stock two-pass `_ln` vs the
one-pass variant, same process, chained-window protocol; also reports the
max relative deviation of the pooled projection output (bf16's own rounding
is ~8e-3, so anything at that scale is free).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/htsat_onepass_ln_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from attention_ledger_probe import make_step, patched  # noqa: E402
from probe_timing import measure_rtt, window_ms  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    import fadtk_tpu.models.htsat as ht

    rtt = measure_rtt()
    print(f"rtt_ms={rtt*1e3:.1f}", flush=True)

    out = {"rtt_ms": round(rtt * 1e3, 2)}
    fwd, params, inputs, _, _ = bench._family_cases()["clap-laion-audio"](jnp.bfloat16)

    def _ln_onepass(x, p, eps=1e-5):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        # one pass over x: E[x^2] accumulated alongside E[x]; clamp the
        # cancellation (same guard as the speech masked group norm)
        var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)

    # numerics: same inputs through both variants once
    ref = np.asarray(jax.jit(fwd)(params, *inputs))
    with patched(ht, "_ln", _ln_onepass):
        alt = np.asarray(jax.jit(lambda p, c: fwd(p, c))(params, *inputs))
    rel = abs(alt - ref) / max(abs(ref), 1e-30)
    out["output_rel_dev"] = float(rel)

    out["two_pass_ms"] = round(window_ms(make_step(fwd), (params, *inputs), rtt), 2)
    print(f"two_pass {out['two_pass_ms']} ms", flush=True)
    with patched(ht, "_ln", _ln_onepass):
        out["one_pass_ms"] = round(window_ms(make_step(fwd), (params, *inputs), rtt), 2)
    print(f"one_pass {out['one_pass_ms']} ms", flush=True)
    out["speedup"] = round(out["two_pass_ms"] / out["one_pass_ms"], 3)

    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "htsat_onepass_ln.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
