"""Decompose the EnCodec forward into conv/elu/lstm/norm shares (whole-model
ablations, honest tunneled-device protocol) — companion to
encodec_byte_floor.py: the byte floor says WHERE the time is not (HBM); this
says where it is.

Ablations (each a monkeypatch, restored in finally):
- full: unmodified forward
- no_elu: jax.nn.elu -> identity (counts the VPU exp share)
- no_lstm: _lstm -> identity (the serial scan share)
- conv_only: both off (pure conv+norm chain = MXU passes + traffic)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/encodec_ablation_probe.py
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

    from fadtk_tpu.models import encodec_impl as impl

    real_elu = jax.nn.elu
    real_lstm = impl._lstm
    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    geoms = {
        "24k": (impl.CONFIG_24K, 64, 240000, 1),
        "48k": (impl.CONFIG_48K, 64, 48000, 2),
    }
    cases = {
        "full": (real_elu, real_lstm),
        "no_elu": (lambda x: x, real_lstm),
        "no_lstm": (real_elu, lambda cfg, p, x: x),
        "conv_only": (lambda x: x, lambda cfg, p, x: x),
    }
    try:
        for gname, (cfg, b, t, ch) in geoms.items():
            x = jnp.asarray(rng.standard_normal((b, ch, t)), jnp.float32) * 0.1
            for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
                params = jax.tree.map(
                    lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                    impl.init_encodec_params(cfg, jax.random.PRNGKey(0)),
                )
                for cname, (elu_fn, lstm_fn) in cases.items():
                    jax.nn.elu = elu_fn
                    impl._lstm = lstm_fn

                    @jax.jit
                    def step(acc, p, a):
                        return acc + impl.encodec_encode(
                            cfg, p, a * (1.0 + acc * 1e-30)
                        ).sum()

                    key = f"{gname}-{dtype_name}-{cname}"
                    try:
                        out[key] = round(window_ms(step, (params, x), rtt), 2)
                    except Exception as e:
                        out[key] = {"error": str(e)[:200]}
                    print(json.dumps({key: out[key]}), flush=True)
    finally:
        jax.nn.elu = real_elu
        impl._lstm = real_lstm
        path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "encodec_ablation.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
