"""A/B the (B,T,H)-layout WavLM gate projection on TPU (whole-model).

The gated-bias tax on wavlm-base bf16 is ~19 of 109 ms; the packed flash
kernel streams the gate*pb product, leaving the gate computation itself on
XLA. The old formulation transposed the hidden states (B,T,H,hd)->(B,H,T,hd)
for the projection and transposed the gate back (B,H,T)->(B,T,H) for the
kernel; the new one contracts head_dim in place and emits (B,T,H) directly
(bit-exact on CPU vs the old code). This probe times the full encoder
forward old vs new at the bench geometry (B=64, 10 s), bf16 and f32.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wavlm_gate_layout_probe.py
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

    from fadtk_tpu.models.speech import encoder as enc
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig

    def old_wavlm_attention(cfg, p, x, key_bias, position_bias, frame_valid=None):
        """The pre-change formulation, verbatim (gate computed in (B,H,T))."""
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
        if x.dtype == jnp.bfloat16 and enc.use_flash_attention(x.dtype, frame_valid):
            from fadtk_tpu.ops.flash_attention import flash_attention_packed

            out = flash_attention_packed(
                q, k, v, frame_valid,
                position_bias.astype(jnp.float32),
                gate.transpose(0, 2, 1).astype(jnp.float32),
                num_heads=cfg.num_heads,
            )
        else:
            qh, kh, vh = (enc._split_heads(y, cfg.num_heads) for y in (q, k, v))
            gated_bias = gate[..., None] * position_bias[None]
            out = enc._attention_core(qh, kh, vh, gated_bias + key_bias)
        return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 64}
    audio = jnp.asarray(rng.standard_normal((64, 160000)), jnp.float32) * 0.1
    nv = jnp.full((64,), 160000, jnp.int32)
    cfg = SpeechEncoderConfig(attention_type="wavlm", do_normalize=False)
    params32 = enc.init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    new_attn = enc.wavlm_attention

    # try/finally: the module-level monkeypatch must not outlive the loop, and
    # per-case failures still leave partial results in .bench_cache.
    try:
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            p = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
            )
            for mode, fn in (("new", new_attn), ("old", old_wavlm_attention)):
                enc.wavlm_attention = fn

                @jax.jit
                def step(acc, p, a, nv):
                    states, _ = enc.speech_encoder_forward(
                        cfg, p, (a + acc * 1e-12).astype(dt), nv, taps=(cfg.num_layers,)
                    )
                    return acc + states[0].astype(jnp.float32).sum()

                key = f"{dtype_name}-{mode}"
                try:
                    out[key] = round(window_ms(step, (p, audio, nv), rtt), 2)
                except Exception as e:
                    out[key] = {"error": str(e)[:200]}
                print(json.dumps({key: out[key]}), flush=True)
    finally:
        enc.wavlm_attention = new_attn
        print(json.dumps(out))
        path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "wavlm_gate_layout.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
