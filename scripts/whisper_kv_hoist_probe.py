"""A/B a hoisted cross-attention KV decoder on TPU (whole-model): a DEAD END.

The decoder costs 3.3 of whisper-base's ~24 ms bf16 forward on 2 forced
tokens (whisper_breakdown_probe); most of its GEMM work is the 2L cross
k/v projections of the SAME (B, 1500, d) encoder states, recomputed inside
every layer. The obvious fix — fuse them into one wide pre-loop GEMM (the
classic encoder-KV cache; ULP-equivalent, CPU-verified) — LOSES whole-model:

    base-bf16  22.70 hoist vs 20.91 plain (0.92x)
    base-f32   41.46 hoist vs 38.10 plain (0.92x)
    large-bf16 413.2 hoist vs 394.1 plain (0.95x, cap lifted, 3.9 GB buffer)

Why: the concatenated (B, S, 2L*d) output is an HBM buffer every layer
re-reads, while the per-layer k/v GEMMs fuse into their consuming attention
einsums and overlap with surrounding ops. Same lesson as the framed-GEMM
conv lowering: isolated-op arithmetic says "fewer dispatches, one enc read",
the whole-model A/B says XLA's fusion already had it cheaper. The hoist
lives only in this probe now (monkeypatched); the model keeps the
per-layer path (models/whisper_impl.py::whisper_decode docstring).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/whisper_kv_hoist_probe.py
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

    def attention_hoisted_kv(p, x, k, v, num_heads):
        b, tq, d = x.shape
        tk = k.shape[1]
        hd = d // num_heads
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]

        def split(t, tlen):
            return t.reshape(b, tlen, num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhtd,bhsd->bhts", split(q, tq) * (hd**-0.5), split(k, tk),
            preferred_element_type=x.dtype,
        )
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhts,bhsd->bhtd", w, split(v, tk), preferred_element_type=x.dtype
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    def decoder_layer_hoisted(cfg, p, x, kv):
        r = x
        x = wi._ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
        x = r + wi._attention(p["self_attn"], x, x, cfg.decoder_heads, causal=True)
        r = x
        x = wi._ln(x, p["encoder_attn_layer_norm"], cfg.layer_norm_eps)
        x = r + attention_hoisted_kv(p["encoder_attn"], x, kv[0], kv[1], cfg.decoder_heads)
        r = x
        x = wi._ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
        x = wi._gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        return r + (x @ p["fc2"]["kernel"] + p["fc2"]["bias"])

    def whisper_decode_hoisted(cfg, params, token_ids, enc_states):
        dec = params["decoder"]
        layers = dec["layers"]
        n = len(layers)
        d = enc_states.shape[-1]
        wk = jnp.concatenate(
            [l["encoder_attn"]["k_proj"]["kernel"] for l in layers]
            + [l["encoder_attn"]["v_proj"]["kernel"] for l in layers],
            axis=1,
        )
        kv = enc_states @ wk  # (B, S, 2*L*d)
        kvs = [
            (
                kv[..., i * d : (i + 1) * d],
                kv[..., (n + i) * d : (n + i + 1) * d]
                + layers[i]["encoder_attn"]["v_proj"]["bias"],
            )
            for i in range(n)
        ]
        x = jnp.take(dec["embed_tokens"], token_ids, axis=0)
        x = x + dec["embed_positions"][None, : token_ids.shape[1]]
        for p, pair in zip(layers, kvs):
            x = decoder_layer_hoisted(cfg, p, x, pair)
        return wi._ln(x, dec["layer_norm"], cfg.layer_norm_eps)

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 16}
    plain_decode = wi.whisper_decode

    cases = [
        ("base-bf16", "base", jnp.bfloat16),
        ("base-f32", "base", jnp.float32),
        ("large-bf16", "large", jnp.bfloat16),
    ]
    for name, size, dt in cases:
        cfg = wi.config_for_size(size)
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
            wi.init_whisper_params(cfg, jax.random.PRNGKey(0)),
        )
        feats = jnp.asarray(
            rng.standard_normal((16, cfg.num_mel_bins, 3000)), jnp.float32
        ) * 0.1

        for mode, fn in (("hoist", whisper_decode_hoisted), ("plain", plain_decode)):
            wi.whisper_decode = fn

            @jax.jit
            def step(acc, p, f):
                y = wi.whisper_forward(cfg, p, f + acc * 1e-12)
                return acc + y.sum()

            key = f"{name}-{mode}"
            try:
                out[key] = round(window_ms(step, (params, feats), rtt), 2)
            except Exception as e:
                out[key] = f"error: {type(e).__name__}"
            print(json.dumps({key: out[key]}), flush=True)
        wi.whisper_decode = plain_decode

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "whisper_kv_hoist.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
