"""Whisper-base breakdown + batch sweep on TPU (bf16 38.9% of roofline; why?).

Components at the bench geometry (B=16, fixed 30 s windows): mel-conv
frontend at T=3000, 6 encoder layers at T=1500/d=512, 6 decoder layers on
2 forced tokens with cross-attention onto the 1500 encoder states
(the reference's 2-frame decoder quirk, fadtk/model_loader.py:662-669).

Variants (serial stages, deltas valid):
- full:        whisper_forward (encoder + 2-token decoder)
- encoder:     whisper_encode only
- enc_noattn:  encoder with self-attention identity (projections removed too)
- enc_nomlp:   encoder with the fc1/fc2 MLP identity
- convs_only:  conv frontend + positions, layers skipped

Plus a batch sweep of the full forward: B in {16, 32, 64}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/whisper_breakdown_probe.py
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
        whisper_encode,
        whisper_forward,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}
    cfg = config_for_size("base")
    params32 = init_whisper_params(cfg, jax.random.PRNGKey(0))

    orig_attention = wi._attention
    orig_encoder_layer = wi._encoder_layer

    def no_attn(p, x, kv, num_heads, causal=False):
        return x

    def no_mlp_layer(cfg_, p, x):
        r = x
        x = wi._ln(x, p["self_attn_layer_norm"], cfg_.layer_norm_eps)
        return r + wi._attention(p["self_attn"], x, x, cfg_.encoder_heads)

    def layers_skipped(cfg_, p, x):
        return x

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
        )
        feats = jnp.asarray(rng.standard_normal((16, 80, 3000)) * 0.3, jnp.float32)

        def mk_full():
            @jax.jit
            def step(acc, p, f):
                y = whisper_forward(cfg, p, f + acc.astype(f.dtype) * 1e-12)
                return acc + y.astype(jnp.float32).sum()

            return step

        def mk_encoder():
            @jax.jit
            def step(acc, p, f):
                y = whisper_encode(cfg, p, (f + acc.astype(f.dtype) * 1e-12).astype(dt))
                return acc + y.astype(jnp.float32).sum()

            return step

        res = {}
        res["full"] = round(window_ms(mk_full(), (params, feats), rtt), 2)
        res["encoder"] = round(window_ms(mk_encoder(), (params, feats), rtt), 2)

        wi._attention = no_attn
        res["enc_noattn"] = round(window_ms(mk_encoder(), (params, feats), rtt), 2)
        wi._attention = orig_attention

        wi._encoder_layer = no_mlp_layer
        res["enc_nomlp"] = round(window_ms(mk_encoder(), (params, feats), rtt), 2)
        wi._encoder_layer = layers_skipped
        res["convs_only"] = round(window_ms(mk_encoder(), (params, feats), rtt), 2)
        wi._encoder_layer = orig_encoder_layer

        res["decoder_delta"] = round(res["full"] - res["encoder"], 2)
        res["attn_delta"] = round(res["encoder"] - res["enc_noattn"], 2)
        res["mlp_delta"] = round(res["encoder"] - res["enc_nomlp"], 2)
        res["layers_delta"] = round(res["encoder"] - res["convs_only"], 2)
        out[dtype_name] = res
        print(json.dumps({dtype_name: res}), flush=True)

    # Batch sweep, bf16 full forward.
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params32
    )
    sweep = {}
    for b in (16, 32, 64):
        feats = jnp.asarray(rng.standard_normal((b, 80, 3000)) * 0.3, jnp.float32)

        @jax.jit
        def step(acc, p, f):
            y = whisper_forward(cfg, p, f + acc.astype(f.dtype) * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        ms = window_ms(step, (params, feats), rtt)
        sweep[f"b{b}"] = {
            "ms_per_call": round(ms, 2),
            "window_sec_per_sec": round(b * 30 / (ms / 1e3), 1),
        }
        print(json.dumps({"sweep_bf16": {f"b{b}": sweep[f'b{b}']}}), flush=True)
    out["sweep_bf16"] = sweep

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "whisper_breakdown.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
