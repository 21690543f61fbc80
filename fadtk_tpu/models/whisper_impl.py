"""Functional JAX implementation of Whisper (encoder + decoder).

Parity target: HF WhisperModel as invoked by the reference
(fadtk/model_loader.py:636-672) — full seq2seq forward with two forced
decoder-start tokens, taking the decoder's last_hidden_state, i.e. exactly 2
embedding frames per 30 s window (SURVEY.md 2.3 flags this quirk; we reproduce
the reference's actual behavior for score parity).

Architecture notes (HF modeling_whisper):
- encoder: conv(80->d, k3, p1) gelu; conv(d->d, k3, s2, p1) gelu; + fixed
  sinusoidal positions (stored as weights); pre-norm transformer; final LN.
- attention: q/v/out projections have bias, k_proj has NO bias.
- decoder: learned positions from index 0; pre-norm; causal self-attention +
  cross-attention onto encoder states; final LN.

The 30 s input window makes every shape static — one XLA compilation serves the
whole dataset, and clips batch freely on the MXU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WhisperConfig:
    d_model: int = 384
    encoder_layers: int = 4
    encoder_heads: int = 6
    decoder_layers: int = 4
    decoder_heads: int = 6
    encoder_ffn: int = 1536
    decoder_ffn: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    decoder_start_token_id: int = 50257
    layer_norm_eps: float = 1e-5


_SIZES = {
    "tiny": WhisperConfig(),
    "base": WhisperConfig(d_model=512, encoder_layers=6, encoder_heads=8,
                          decoder_layers=6, decoder_heads=8,
                          encoder_ffn=2048, decoder_ffn=2048),
    "small": WhisperConfig(d_model=768, encoder_layers=12, encoder_heads=12,
                           decoder_layers=12, decoder_heads=12,
                           encoder_ffn=3072, decoder_ffn=3072),
    "medium": WhisperConfig(d_model=1024, encoder_layers=24, encoder_heads=16,
                            decoder_layers=24, decoder_heads=16,
                            encoder_ffn=4096, decoder_ffn=4096),
    "large": WhisperConfig(d_model=1280, encoder_layers=32, encoder_heads=20,
                           decoder_layers=32, decoder_heads=20,
                           encoder_ffn=5120, decoder_ffn=5120),
}


def config_for_size(size: str) -> WhisperConfig:
    return _SIZES[size]


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu(x):
    # Exact erf in f32 (HF parity); tanh-approx in bf16 (precision.gelu).
    from .precision import gelu

    return gelu(x)


def _attention(p, x, kv, num_heads, causal=False):
    """Whisper attention; kv == x for self-attention. k_proj has no bias.

    Measured: the fused flash kernel does NOT pay here (bf16 B=16: 26.2 ms
    XLA vs 32.2 ms flash for the full forward) — this path computes logits
    in x.dtype, so the bf16 mode never materializes f32 weights and XLA's
    fused softmax wins; the speech encoders differ (f32 logits for parity).
    Re-probed in round 3 for f32 at the whisper-large encoder geometry
    (B=16, H=20, T=1500): XLA 9.51 ms vs flash 10.51 ms isolated — XLA's
    blocked softmax handles even the (B,H,T,T) f32 logits well, so flash
    stays off in both dtypes.
    Re-probed once more after the packed-heads kernel landed (it reversed
    the speech-family verdicts, so the whisper one deserved a retest):
    whole-model flash_attention_packed in the encoder still LOSES —
    bf16 base 20.8 -> 23.9 ms, bf16 large 394 -> 432 ms; f32 base won
    only 1.07x, not worth perturbing the HF-parity numerics
    (scripts/whisper_flash_probe.py). Unlike the speech stack, this path
    keeps logits in compute dtype, so XLA never pays the f32
    materialization the kernel exists to avoid."""
    b, tq, d = x.shape
    tk = kv.shape[1]
    hd = d // num_heads

    q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
    k = kv @ p["k_proj"]["kernel"]
    v = kv @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]

    def split(t, tlen):
        return t.reshape(b, tlen, num_heads, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhtd,bhsd->bhts", split(q, tq) * (hd**-0.5), split(k, tk),
        preferred_element_type=x.dtype,
    )
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool))
        logits = jnp.where(mask, logits, jnp.finfo(x.dtype).min)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, split(v, tk), preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def _run_layers(layers, apply, x):
    """Unrolled layer loop, or `lax.scan` over the stacked homogeneous layers
    under FADTK_TPU_SCAN_LAYERS=1 (same opt-in compile-time mode as the
    speech encoder — whisper-large has 32+32 layers, the biggest unrolled
    trace in the zoo; scan reorders f32 accumulation, so the unrolled loop
    stays the parity default)."""
    from .speech.encoder import scan_layers_enabled

    if scan_layers_enabled() and len(layers) > 1:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        x, _ = jax.lax.scan(lambda c, p: (apply(p, c), None), x, stacked)
        return x
    for p in layers:
        x = apply(p, x)
    return x


def _encoder_layer(cfg, p, x):
    r = x
    x = _ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
    x = r + _attention(p["self_attn"], x, x, cfg.encoder_heads)
    r = x
    x = _ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
    x = _gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return r + (x @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def whisper_encode(cfg: WhisperConfig, params, input_features: jax.Array) -> jax.Array:
    """(B, 80, 3000) log-mel -> (B, 1500, d) encoder states."""
    enc = params["encoder"]
    x = input_features.transpose(0, 2, 1)  # NHC: (B, 3000, 80)
    x = _gelu(
        jax.lax.conv_general_dilated(
            x, enc["conv1"]["kernel"], (1,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=x.dtype,
        ) + enc["conv1"]["bias"]
    )
    x = _gelu(
        jax.lax.conv_general_dilated(
            x, enc["conv2"]["kernel"], (2,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=x.dtype,
        ) + enc["conv2"]["bias"]
    )
    x = x + enc["embed_positions"][None, : x.shape[1]]
    x = _run_layers(enc["layers"], lambda p, c: _encoder_layer(cfg, p, c), x)
    return _ln(x, enc["layer_norm"], cfg.layer_norm_eps)


def _decoder_layer(cfg, p, x, enc_states):
    r = x
    x = _ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
    x = r + _attention(p["self_attn"], x, x, cfg.decoder_heads, causal=True)
    r = x
    x = _ln(x, p["encoder_attn_layer_norm"], cfg.layer_norm_eps)
    x = r + _attention(p["encoder_attn"], x, enc_states, cfg.decoder_heads)
    r = x
    x = _ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
    x = _gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return r + (x @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def whisper_decode(cfg: WhisperConfig, params, token_ids: jax.Array, enc_states: jax.Array):
    """(B, T) tokens + encoder states -> (B, T, d) decoder last hidden state.

    Measured dead end (round 3, scripts/whisper_kv_hoist_probe.py): hoisting
    all layers' cross-attention k/v projections of the shared enc_states into
    ONE wide pre-loop GEMM (the classic encoder-KV cache) ran 0.92x on base
    (both dtypes) and 0.95x on large bf16 — the concatenated output is a
    large HBM buffer the layers must re-read, where the per-layer GEMMs fuse
    into their consuming attention and overlap with the surrounding ops.
    The per-layer path below is the measured winner.
    """
    dec = params["decoder"]
    x = jnp.take(dec["embed_tokens"], token_ids, axis=0)
    x = x + dec["embed_positions"][None, : token_ids.shape[1]]
    x = _run_layers(
        dec["layers"], lambda p, c: _decoder_layer(cfg, p, c, enc_states), x
    )
    return _ln(x, dec["layer_norm"], cfg.layer_norm_eps)


def whisper_forward(cfg: WhisperConfig, params, input_features: jax.Array) -> jax.Array:
    """The reference's embedding forward: 2 forced start tokens -> (B, 2, d)
    decoder states (fadtk/model_loader.py:662,669).

    Compute follows the parameter dtype (models/precision.py; bf16 fast mode
    measured +71% throughput on whisper-base); float32 out for the f16 cache.
    """
    from .precision import param_dtype

    input_features = input_features.astype(param_dtype(params))
    enc_states = whisper_encode(cfg, params, input_features)
    b = input_features.shape[0]
    tokens = jnp.full((b, 2), cfg.decoder_start_token_id, jnp.int32)
    return whisper_decode(cfg, params, tokens, enc_states).astype(jnp.float32)


# --------------------------------------------------------------------------- #
# Random init (tests / benchmarks)
# --------------------------------------------------------------------------- #


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions (stored as weights)."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_whisper_params(cfg: WhisperConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8192))
    d = cfg.d_model

    def dense(i, o, bias=True):
        s = 1.0 / math.sqrt(i)
        p = {"kernel": jax.random.uniform(next(keys), (i, o), dtype, -s, s)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def attn():
        return {
            "q_proj": dense(d, d),
            "k_proj": dense(d, d, bias=False),
            "v_proj": dense(d, d),
            "out_proj": dense(d, d),
        }

    def enc_layer():
        return {
            "self_attn": attn(),
            "self_attn_layer_norm": ln(),
            "fc1": dense(d, cfg.encoder_ffn),
            "fc2": dense(cfg.encoder_ffn, d),
            "final_layer_norm": ln(),
        }

    def dec_layer():
        return {
            "self_attn": attn(),
            "self_attn_layer_norm": ln(),
            "encoder_attn": attn(),
            "encoder_attn_layer_norm": ln(),
            "fc1": dense(d, cfg.decoder_ffn),
            "fc2": dense(cfg.decoder_ffn, d),
            "final_layer_norm": ln(),
        }

    def conv(cin, cout, k):
        s = 1.0 / math.sqrt(k * cin)
        return {
            "kernel": jax.random.uniform(next(keys), (k, cin, cout), dtype, -s, s),
            "bias": jnp.zeros((cout,), dtype),
        }

    return {
        "encoder": {
            "conv1": conv(cfg.num_mel_bins, d, 3),
            "conv2": conv(d, d, 3),
            "embed_positions": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
            "layers": [enc_layer() for _ in range(cfg.encoder_layers)],
            "layer_norm": ln(),
        },
        "decoder": {
            "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
            "embed_positions": jax.random.normal(
                next(keys), (cfg.max_target_positions, d), dtype
            ) * 0.02,
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "layer_norm": ln(),
        },
    }
