"""Price WavLM's gated relative-position-bias machinery on TPU.

wavlm-base bf16 runs 1.72 ms/clip vs w2v2-base's 1.36 (bench, B=64 vs 128)
— the delta is the gated bias: the per-(b,h) flash kernel streams
(H, BQ, BK) position-bias blocks and a (B, H, T) gate, re-reading the
batch-independent pb once per batch element (~0.8 GB/layer at B=64).

Probe: same geometry (B=64, 10 s), wavlm attention vs the plain w2v2
attention (architecture identical otherwise). The delta bounds what a
batch-blocked bias-streaming kernel (read pb once per G_b batch elements)
could recover — decide before modifying the factorized-bias kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wavlm_bias_cost_probe.py
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

    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 64}
    audio = jnp.asarray(rng.standard_normal((64, 160000)), jnp.float32) * 0.1
    nv = jnp.full((64,), 160000, jnp.int32)

    for name, attn in (("wavlm", "wavlm"), ("plain", "standard")):
        cfg = SpeechEncoderConfig(attention_type=attn, do_normalize=False)
        params32 = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            p = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
            )

            @jax.jit
            def step(acc, p, a, nv, cfg=cfg):
                states, _ = speech_encoder_forward(
                    cfg, p, (a + acc * 1e-12).astype(dt), nv, taps=(cfg.num_layers,)
                )
                return acc + states[0].astype(jnp.float32).sum()

            key = f"{name}-{dtype_name}"
            out[key] = round(window_ms(step, (p, audio, nv), rtt), 2)
            print(json.dumps({key: out[key]}), flush=True)

    for d in ("bf16", "f32"):
        out[f"bias_cost_ms_{d}"] = round(out[f"wavlm-{d}"] - out[f"plain-{d}"], 2)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "wavlm_bias_cost.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
