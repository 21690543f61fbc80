"""Whole-model A/B: one-pass f32-accumulated LayerNorm moments for the
remaining bf16 transformer families (whisper, speech encoder).

The HTSAT A/B (scripts/htsat_onepass_ln_probe.py, ATTENTION_LEDGER_r05.json)
measured 1.031x and shipped; the ledger puts LN at 1.19 of whisper-base's
20.41 ms and 2.72 of wavlm-base's 104.18 ms, so the expected wins are ~3%
and ~1.5%. Per the PERF.md §5 discipline, nothing ships without this
whole-model A/B inside the production bench graph.

Patches:
  whisper_impl._ln        two-pass in compute dtype -> one-pass f32-accum
  speech.encoder._layer_norm  two-pass f32 stats    -> one-pass f32 stats

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ln_onepass_sweep_probe.py
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
    import fadtk_tpu.models.speech.encoder as enc
    import fadtk_tpu.models.whisper_impl as wh

    rtt = measure_rtt()
    print(f"rtt_ms={rtt*1e3:.1f}", flush=True)
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    def ln_onepass(x, p, eps):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)

    cases = bench._family_cases()
    for name, mod, attr in (
        ("whisper-base", wh, "_ln"),
        ("wavlm-base", enc, "_layer_norm"),
        ("w2v2-base", enc, "_layer_norm"),
    ):
        fwd, params, inputs, _, _ = cases[name](jnp.bfloat16)
        res = {}

        # numerics first: same inputs through both variants once
        ref = np.asarray(
            jax.jit(fwd)(params, *inputs), dtype=np.float32
        )
        with patched(mod, attr, ln_onepass):
            alt = np.asarray(
                jax.jit(lambda p, *i: fwd(p, *i))(params, *inputs),
                dtype=np.float32,
            )
        denom = max(float(np.max(np.abs(ref))), 1e-30)
        res["output_rel_dev"] = float(np.max(np.abs(alt - ref)) / denom)

        res["two_pass_ms"] = round(window_ms(make_step(fwd), (params, *inputs), rtt), 2)
        print(f"{name} two_pass {res['two_pass_ms']} ms", flush=True)
        with patched(mod, attr, ln_onepass):
            res["one_pass_ms"] = round(
                window_ms(make_step(fwd), (params, *inputs), rtt), 2
            )
        print(f"{name} one_pass {res['one_pass_ms']} ms", flush=True)
        res["speedup"] = round(res["two_pass_ms"] / res["one_pass_ms"], 3)
        out[name] = res
        print(json.dumps({name: res}), flush=True)

        path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "ln_onepass_sweep.json"), "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
