"""One-pass masked group-norm moments for the speech extractor (TPU A/B).

The w2v2 extractor's per-channel masked group norm walks the huge
(B, 32000, 512) conv-0 output three times (sum, centered-square sum,
normalize). One-pass moments (m1, m2 in f32) save one traversal — the same
trick that took EnCodec-48k's time_group_norm from 21.7 to 17.2 ms — but
here the tensor is touched once per FORWARD (not per conv), so the bound
is a few ms. Masked exactness is preserved (zeros contribute zero to both
sums). bf16-only candidate; f32 keeps the two-pass form (cancellation).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/groupnorm_onepass_probe.py
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

    import fadtk_tpu.models.speech.encoder as enc
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 128}

    cfg = SpeechEncoderConfig(do_normalize=False)
    params32 = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((128, 160000)), jnp.float32) * 0.1
    nv = jnp.full((128,), 160000, jnp.int32)

    orig = enc._masked_group_norm_per_channel

    def onepass(x, mask, p, eps=1e-5):
        m = mask[..., None]
        x32 = x.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        s1 = jnp.sum(x32 * m, axis=1, keepdims=True)
        s2 = jnp.sum(jnp.square(x32) * m, axis=1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)

    p16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params32
    )

    def mk():
        @jax.jit
        def step(acc, p, a, nv):
            states, _ = speech_encoder_forward(
                cfg, p, (a + acc * 1e-12).astype(jnp.bfloat16), nv,
                taps=(cfg.num_layers,),
            )
            return acc + states[0].astype(jnp.float32).sum()

        return step

    enc._masked_group_norm_per_channel = orig
    out["twopass_ms"] = round(window_ms(mk(), (p16, audio, nv), rtt), 2)
    enc._masked_group_norm_per_channel = onepass
    out["onepass_ms"] = round(window_ms(mk(), (p16, audio, nv), rtt), 2)
    enc._masked_group_norm_per_channel = orig
    out["speedup"] = round(out["twopass_ms"] / out["onepass_ms"], 3)
    print(json.dumps(out))

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "groupnorm_onepass.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
