"""Tensor-parallel Whisper forward (encoder + 2-token decoder).

Megatron-style column/row-parallel attention and FFN over the 'tp' mesh axis,
for the whisper-medium/large variants where a single chip's HBM/latency budget
benefits from sharding (BASELINE config 5: whisper-large sweep). Math mirrors
models/whisper_impl.py exactly; one psum after each attention out-projection
and each fc2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import whisper_impl as w


def whisper_param_specs(cfg: w.WhisperConfig, params) -> dict:
    attn = {
        "q_proj": {"kernel": P(None, "tp"), "bias": P("tp")},
        "k_proj": {"kernel": P(None, "tp")},
        "v_proj": {"kernel": P(None, "tp"), "bias": P("tp")},
        "out_proj": {"kernel": P("tp", None), "bias": P()},
    }
    ln = {"scale": P(), "bias": P()}

    def enc_layer():
        return {
            "self_attn": attn,
            "self_attn_layer_norm": ln,
            "fc1": {"kernel": P(None, "tp"), "bias": P("tp")},
            "fc2": {"kernel": P("tp", None), "bias": P()},
            "final_layer_norm": ln,
        }

    def dec_layer():
        return {
            "self_attn": attn,
            "self_attn_layer_norm": ln,
            "encoder_attn": attn,
            "encoder_attn_layer_norm": ln,
            "fc1": {"kernel": P(None, "tp"), "bias": P("tp")},
            "fc2": {"kernel": P("tp", None), "bias": P()},
            "final_layer_norm": ln,
        }

    return {
        "encoder": {
            "conv1": {"kernel": P(), "bias": P()},
            "conv2": {"kernel": P(), "bias": P()},
            "embed_positions": P(),
            "layers": [enc_layer() for _ in range(cfg.encoder_layers)],
            "layer_norm": ln,
        },
        "decoder": {
            "embed_tokens": P(),
            "embed_positions": P(),
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "layer_norm": ln,
        },
    }


def _tp_attention(p, x, kv, num_heads_local, head_dim, tp_axis, causal=False):
    b, tq, _ = x.shape
    tk = kv.shape[1]
    q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
    k = kv @ p["k_proj"]["kernel"]
    v = kv @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]

    def split(t, tlen):
        return t.reshape(b, tlen, num_heads_local, head_dim).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhtd,bhsd->bhts", split(q, tq) * (head_dim**-0.5), split(k, tk),
        preferred_element_type=jnp.float32,
    )
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, split(v, tk), preferred_element_type=jnp.float32)
    out = out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, tq, -1)
    out = jax.lax.psum(out @ p["out_proj"]["kernel"], tp_axis)
    return out + p["out_proj"]["bias"]


def _tp_ffn(p, x, tp_axis):
    h = w._gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return jax.lax.psum(h @ p["fc2"]["kernel"], tp_axis) + p["fc2"]["bias"]


def _tp_whisper_forward(cfg: w.WhisperConfig, params, input_features, tp_axis="tp"):
    tp_size = jax.lax.axis_size(tp_axis)
    enc_heads = cfg.encoder_heads // tp_size
    dec_heads = cfg.decoder_heads // tp_size
    hd = cfg.d_model // cfg.encoder_heads
    hd_dec = cfg.d_model // cfg.decoder_heads

    enc = params["encoder"]
    x = input_features.transpose(0, 2, 1)
    for conv, stride in ((enc["conv1"], 1), (enc["conv2"], 2)):
        x = w._gelu(
            jax.lax.conv_general_dilated(
                x, conv["kernel"], (stride,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=x.dtype,
            ) + conv["bias"]
        )
    x = x + enc["embed_positions"][None, : x.shape[1]]
    for p in enc["layers"]:
        r = x
        y = w._ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
        x = r + _tp_attention(p["self_attn"], y, y, enc_heads, hd, tp_axis)
        r = x
        y = w._ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
        x = r + _tp_ffn(p, y, tp_axis)
    enc_states = w._ln(x, enc["layer_norm"], cfg.layer_norm_eps)

    dec = params["decoder"]
    b = input_features.shape[0]
    tokens = jnp.full((b, 2), cfg.decoder_start_token_id, jnp.int32)
    x = jnp.take(dec["embed_tokens"], tokens, axis=0)
    x = x + dec["embed_positions"][None, :2]
    for p in dec["layers"]:
        r = x
        y = w._ln(x, p["self_attn_layer_norm"], cfg.layer_norm_eps)
        x = r + _tp_attention(p["self_attn"], y, y, dec_heads, hd_dec, tp_axis, causal=True)
        r = x
        y = w._ln(x, p["encoder_attn_layer_norm"], cfg.layer_norm_eps)
        x = r + _tp_attention(p["encoder_attn"], y, enc_states, dec_heads, hd_dec, tp_axis)
        r = x
        y = w._ln(x, p["final_layer_norm"], cfg.layer_norm_eps)
        x = r + _tp_ffn(p, y, tp_axis)
    return w._ln(x, dec["layer_norm"], cfg.layer_norm_eps)


# Memoized like parallel/tp.py's speech step: a fresh jit object per call
# would re-compile every invocation (jax's executable cache keys on function
# identity); values hold only specs + the jitted fn, params stay call args.
_WHISPER_STEP_CACHE: dict = {}


def make_sharded_whisper_step(cfg: w.WhisperConfig, params, mesh: Mesh):
    """jitted step: (B, 80, T) features sharded over dp -> (B, 2, d) embeddings
    gathered; attention/FFN sharded over tp. Memoized per (cfg, param
    structure, mesh)."""
    key = (cfg, jax.tree_util.tree_structure(params), mesh)
    cached = _WHISPER_STEP_CACHE.get(key)
    if cached is not None:
        return cached
    specs = whisper_param_specs(cfg, params)

    def step(p, feats):
        return _tp_whisper_forward(cfg, p, feats)

    fn = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(specs, P("dp", None, None)),
            out_specs=P("dp", None, None),
            # Same rationale as parallel/tp.py: Pallas out_shapes carry no vma
            # annotation; tests/test_whisper_tp.py pins TP == single-device.
            check_vma=False,
        )
    )
    _WHISPER_STEP_CACHE[key] = fn
    return fn
