"""Whole-model A/B on TPU: wavlm bf16 — packed-bias kernel vs per-(b,h).

Context: the bias-cost probe (scripts/wavlm_bias_cost_probe.py) measured
the gated-bias machinery at 19.0 ms of the 109.2 ms bf16 forward (B=64),
while f32's XLA dense path pays only 7.0 — the per-(b,h) kernel re-reads
the batch-independent (H, T, T) bias per batch element AND pays the
128-byte DMA rows + 4 head transposes the packed kernel removed for the
other speech families (+28% w2v2 whole-model). The packed-bias variant
(flash_attention_packed with position_bias/gate) streams (H, BQ, BK) bias
slabs in the head-packed grid.

A/B via git-state: the model now routes wavlm-bf16 to the packed kernel;
the old path is reproduced here by monkeypatching wavlm_attention back to
the per-(b,h) call.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wavlm_packed_probe.py
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
        _attention_core,
        _split_heads,
        init_speech_encoder_params,
        speech_encoder_forward,
        use_flash_attention,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 64}

    cfg = SpeechEncoderConfig(attention_type="wavlm", do_normalize=False)
    params32 = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((64, 160000)), jnp.float32) * 0.1
    nv = jnp.full((64,), 160000, jnp.int32)

    new_wavlm_attention = enc.wavlm_attention

    def old_wavlm_attention(cfg, p, x, key_bias, position_bias, frame_valid=None):
        """Round-3 routing: per-(b,h) factorized-bias kernel."""
        b, t, _ = x.shape
        gated_hs = x.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        proj = gated_hs @ p["gru_rel_pos_linear"]["kernel"] + p["gru_rel_pos_linear"]["bias"]
        proj = proj.reshape(b, cfg.num_heads, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj)
        gate_a, gate_b = gates[..., 0], gates[..., 1]
        const = p["gru_rel_pos_const"].reshape(1, cfg.num_heads, 1)
        gate = gate_a * (gate_b * const - 1.0) + 2.0

        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
        v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        qh, kh, vh = (_split_heads(y, cfg.num_heads) for y in (q, k, v))
        if x.dtype == jnp.bfloat16 and use_flash_attention(x.dtype, frame_valid):
            from fadtk_tpu.ops.flash_attention import flash_attention

            o = flash_attention(
                qh, kh, vh, frame_valid,
                position_bias=position_bias.astype(jnp.float32),
                gate=gate.astype(jnp.float32),
            )
            bo, h, to, d = o.shape
            out = o.transpose(0, 2, 1, 3).reshape(bo, to, h * d)
        else:
            gated_bias = gate[..., None] * position_bias[None]
            out = _attention_core(qh, kh, vh, gated_bias + key_bias)
        return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

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

    enc.wavlm_attention = old_wavlm_attention
    out["per_bh_ms"] = round(window_ms(mk(), (p16, audio, nv), rtt), 2)
    enc.wavlm_attention = new_wavlm_attention
    out["packed_ms"] = round(window_ms(mk(), (p16, audio, nv), rtt), 2)

    # packed + bf16 position-bias stream: halves the dominant (H, BQ, BK)
    # slab traffic; the kernel upcasts per block so state stays f32. (The
    # production call site casts pb to f32, so this variant calls the
    # kernel directly.)
    def packed_bf16pb(cfg, p, x, key_bias, position_bias, frame_valid=None):
        from fadtk_tpu.ops.flash_attention import flash_attention_packed

        b, t, _ = x.shape
        gated_hs = x.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        proj = gated_hs @ p["gru_rel_pos_linear"]["kernel"] + p["gru_rel_pos_linear"]["bias"]
        proj = proj.reshape(b, cfg.num_heads, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj)
        gate = gates[..., 0] * (gates[..., 1] * p["gru_rel_pos_const"].reshape(1, cfg.num_heads, 1) - 1.0) + 2.0
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
        v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        out = flash_attention_packed(
            q, k, v, frame_valid,
            position_bias.astype(jnp.bfloat16),
            gate.transpose(0, 2, 1).astype(jnp.float32),
            num_heads=cfg.num_heads,
        )
        return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    enc.wavlm_attention = packed_bf16pb
    out["packed_bf16pb_ms"] = round(window_ms(mk(), (p16, audio, nv), rtt), 2)
    enc.wavlm_attention = new_wavlm_attention
    out["speedup_packed"] = round(out["per_bh_ms"] / out["packed_ms"], 3)
    out["speedup_bf16pb"] = round(out["per_bh_ms"] / out["packed_bf16pb_ms"], 3)
    print(json.dumps(out))

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "wavlm_packed.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
