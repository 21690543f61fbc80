"""Whole-model A/B on TPU: fused SEANet resnet kernel vs the XLA chain.

EnCodec-24k at the bench geometry (B=64, 10 s). The stage ablation
(scripts/encodec_stage_probe.py) bounds the win: resnets cost 21.3 + 24.2 +
6.0 + 2.1 ms f32 (15.7 + 18.6 + 4.5 + 1.3 bf16) of 76.0 / 61.0 total, with
a ~2.5 ms/resnet HBM floor at stage-1 bytes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_resnet_probe.py
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

    from fadtk_tpu.models.encodec_impl import (
        CONFIG_24K,
        encodec_encode,
        init_encodec_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    params = init_encodec_params(CONFIG_24K, jax.random.PRNGKey(0))
    clips = jnp.asarray(rng.standard_normal((64, 1, 240000)) * 0.1, jnp.float32)

    def mk():
        @jax.jit
        def step(acc, p, x):
            y = encodec_encode(CONFIG_24K, p, x + acc * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        return step

    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        p = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
        res = {}
        os.environ["FADTK_TPU_FUSED_RESNET"] = "0"
        res["xla"] = round(window_ms(mk(), (p, clips), rtt), 2)
        os.environ["FADTK_TPU_FUSED_RESNET"] = "1"
        res["fused"] = round(window_ms(mk(), (p, clips), rtt), 2)
        res["speedup"] = round(res["xla"] / res["fused"], 3)
        out[f"enc24-{dtype_name}"] = res
        print(json.dumps({f"enc24-{dtype_name}": res}), flush=True)

    # numeric check on device (f32)
    os.environ["FADTK_TPU_FUSED_RESNET"] = "0"
    ref = np.asarray(jax.jit(lambda p, x: encodec_encode(CONFIG_24K, p, x))(params, clips[:4]))
    os.environ["FADTK_TPU_FUSED_RESNET"] = "1"
    got = np.asarray(jax.jit(lambda p, x: encodec_encode(CONFIG_24K, p, x))(params, clips[:4]))
    os.environ.pop("FADTK_TPU_FUSED_RESNET", None)
    out["f32_absdiff"] = float(np.abs(got - ref).max())
    print(json.dumps({"f32_absdiff": out["f32_absdiff"]}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "fused_resnet_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
