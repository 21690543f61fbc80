"""Per-stage cost of the EnCodec-24k encoder on TPU (prefix ablation).

The family sits at 14% of roofline with a "narrow-channel conv stack,
width/HBM-bound" diagnosis; the elu ablation (6.7 of 76.4 ms f32) and the
LSTM ablation (~6%) priced two pieces. This probe prices every stage: time
the forward truncated after each plan entry; consecutive deltas are the
per-stage cost (stages are serial). The early full-rate layers (conv k=7 at
T=240k, resnet at C=32) should dominate if the HBM-width diagnosis is right
— and the deltas bound what a VMEM-resident fused conv-chain kernel could
recover per stage.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/encodec_stage_probe.py
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

    import fadtk_tpu.models.encodec_impl as ei
    from fadtk_tpu.models.encodec_impl import (
        CONFIG_24K,
        encoder_plan,
        init_encodec_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    cfg = CONFIG_24K
    plan = encoder_plan(cfg)
    params = init_encodec_params(cfg, jax.random.PRNGKey(0))
    clips = jnp.asarray(rng.standard_normal((64, 1, 240000)) * 0.1, jnp.float32)

    def prefix_forward(p, x, n):
        from fadtk_tpu.models.precision import param_dtype

        x = x.astype(param_dtype(p))
        for kind, idx, meta in plan[:n]:
            lp = p["layers"].get(str(idx))
            if kind == "conv":
                x = ei._conv_layer(cfg, lp, x, meta["k"], meta["stride"], meta["dil"])
            elif kind == "resnet":
                x = ei._resnet_block(cfg, lp, x, meta["dilations"])
            elif kind == "elu":
                x = jax.nn.elu(x)
            elif kind == "lstm":
                x = ei._lstm(cfg, lp, x)
        return x

    out = {"rtt_ms": round(rtt * 1e3, 2), "plan": [f"{k}{m or ''}" for k, _, m in plan]}

    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        p = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params
        )
        times = []
        for n in range(1, len(plan) + 1):
            @jax.jit
            def step(acc, p, x, n=n):
                y = prefix_forward(p, x + acc * 1e-12, n)
                return acc + y.astype(jnp.float32).sum()

            times.append(round(window_ms(step, (p, clips), rtt), 2))
            print(json.dumps({dtype_name: {f"prefix_{n}_{plan[n-1][0]}": times[-1]}}), flush=True)
        deltas = [times[0]] + [round(b - a, 2) for a, b in zip(times, times[1:])]
        out[dtype_name] = {
            "prefix_ms": times,
            "stage_deltas_ms": deltas,
            "stages": [k for k, _, _ in plan],
        }
        print(json.dumps({f"{dtype_name}_deltas": list(zip(out[dtype_name]['stages'], deltas))}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "encodec_stage_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
