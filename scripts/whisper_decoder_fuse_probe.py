"""A/B the whisper 2-token decoder's projection fusions (round-3 verdict #7:
"spend the ~3-5% residue" — decoder is 3.3 of whisper-base's 20.7 ms bf16).

The decoder is already inside the same jit as the encoder (whisper_forward),
so there is no dispatch gap to close; what remains is pass count. Candidates
(whole-model A/B at the bench geometry, B=16, both dtypes):

- kv_fused: each decoder layer's cross-attention k/v projections of the
  shared enc_states run as ONE (d, 2d) GEMM (halves the count of the
  decoder's only large GEMMs: 12 -> 6 passes over (B*1500, d) rows). This is
  NOT the round-3 dead-end (that hoisted ALL layers into one pre-loop GEMM
  whose giant output buffer the layers re-read); here the fusion stays
  inside the layer, the consumer is adjacent, locality is unchanged.
- qkv_fused: kv_fused + the decoder self-attention q/k/v on the (B, 2, d)
  tokens as one (d, 3d) GEMM (3 tiny passes -> 1, x6 layers).

The kernels are concatenated inside the jit from the stock params (one 1-2 MB
concat per layer per call — if a variant wins, the concat moves to load time).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/whisper_decoder_fuse_probe.py
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

    from fadtk_tpu.models import whisper_impl as impl

    real_layer = impl._decoder_layer

    def attn_kv_fused(p, x, enc, num_heads):
        b, tq, d = x.shape
        tk = enc.shape[1]
        hd = d // num_heads
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        w_kv = jnp.concatenate(
            [p["k_proj"]["kernel"], p["v_proj"]["kernel"]], axis=1
        )
        kv = enc @ w_kv  # one (d, 2d) GEMM over (B*1500, d)
        k, v = kv[..., :d], kv[..., d:] + p["v_proj"]["bias"]

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

    def attn_self_qkv_fused(p, x, num_heads):
        b, tq, d = x.shape
        hd = d // num_heads
        w_qkv = jnp.concatenate(
            [p["q_proj"]["kernel"], p["k_proj"]["kernel"], p["v_proj"]["kernel"]],
            axis=1,
        )
        qkv = x @ w_qkv
        q = qkv[..., :d] + p["q_proj"]["bias"]
        k = qkv[..., d : 2 * d]
        v = qkv[..., 2 * d :] + p["v_proj"]["bias"]

        def split(t):
            return t.reshape(b, tq, num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhtd,bhsd->bhts", split(q) * (hd**-0.5), split(k),
            preferred_element_type=x.dtype,
        )
        mask = jnp.tril(jnp.ones((tq, tq), bool))
        logits = jnp.where(mask, logits, jnp.finfo(x.dtype).min)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhts,bhsd->bhtd", w, split(v), preferred_element_type=x.dtype
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    def make_layer(fuse_self: bool):
        def layer(cfg, p, x, enc_states):
            r = x
            x = impl._ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
            if fuse_self:
                x = r + attn_self_qkv_fused(p["self_attn"], x, cfg.decoder_heads)
            else:
                x = r + impl._attention(
                    p["self_attn"], x, x, cfg.decoder_heads, causal=True
                )
            r = x
            x = impl._ln(x, p["encoder_attn_layer_norm"], cfg.layer_norm_eps)
            x = r + attn_kv_fused(
                p["encoder_attn"], x, enc_states, cfg.decoder_heads
            )
            r = x
            x = impl._ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
            x = impl._gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
            return r + (x @ p["fc2"]["kernel"] + p["fc2"]["bias"])

        return layer

    cases = {
        "base_impl": real_layer,
        "kv_fused": make_layer(False),
        "qkv_fused": make_layer(True),
    }

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 16}
    cfg = impl.config_for_size("base")
    params32 = impl.init_whisper_params(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((16, 80, 3000)), jnp.float32) * 0.5

    try:
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            p = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
            )
            ref_out = None
            for cname, layer_fn in cases.items():
                impl._decoder_layer = layer_fn

                @jax.jit
                def step(acc, pp, f):
                    return acc + impl.whisper_forward(
                        cfg, pp, f * (1.0 + acc * 1e-30)
                    ).sum()

                # Equivalence check first (fusions must be bit-meaningful).
                y = jax.jit(
                    lambda pp, f: impl.whisper_forward(cfg, pp, f)
                )(p, feats)
                if ref_out is None:
                    ref_out = np.asarray(y, np.float64)
                else:
                    rel = float(
                        np.max(np.abs(np.asarray(y, np.float64) - ref_out))
                        / (np.max(np.abs(ref_out)) + 1e-12)
                    )
                    out[f"{dtype_name}-{cname}-maxrel_vs_base"] = f"{rel:.2e}"

                key = f"{dtype_name}-{cname}"
                try:
                    out[key] = round(window_ms(step, (p, feats), rtt), 2)
                except Exception as e:
                    out[key] = {"error": str(e)[:200]}
                print(json.dumps({key: out[key]}), flush=True)
    finally:
        impl._decoder_layer = real_layer
        path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "whisper_decoder_fuse.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
