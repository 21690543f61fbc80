"""Shared speech-transformer encoder (wav2vec 2.0 / HuBERT / WavLM / MERT).

From-scratch functional JAX implementation, numerically equivalent to the HF
torch models the reference invokes (reference fadtk/model_loader.py:525-633 for
w2v2/hubert/wavlm, :254-288 for MERT) — differential-tested against transformers
in tests/test_speech_encoder.py.

TPU-first design decisions:

- **Static shapes with exact masking.** The reference runs one unpadded clip at
  a time; we batch clips padded to length buckets. Every cross-time operation
  (conv-extractor group norm, positional conv, attention) is mask-aware so the
  valid frames are bit-identical to an unpadded run — padding never perturbs
  scores, it only buys us one XLA compilation per bucket and full MXU batching.
- **Functional params.** Parameters are plain nested dicts (mirroring the torch
  module tree for easy checkpoint conversion) and the forward is a pure
  function: trivially jit/vmap/shard_map-able, with tensor-parallel sharding
  annotations applied externally (fadtk_tpu.parallel).
- **All 13/25 hidden states in one pass**, stacked on a leading axis, matching
  HF's ``output_hidden_states=True`` tuple that the reference indexes for its
  per-layer model variants (fadtk/model_loader.py:553-558).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import SpeechEncoderConfig


def scan_layers_enabled() -> bool:
    """Opt-in `lax.scan` over the homogeneous encoder layers
    (FADTK_TPU_SCAN_LAYERS=1): compiles ~1.7x faster for 24-layer models
    (40.7 s -> 24.1 s measured on v5e) with identical steady-state runtime.
    Off by default: the scan's different fusion boundaries reorder f32
    accumulation (~1e-2 after 24 layers on the TPU's 3-pass f32 matmuls),
    so the unrolled loop stays the parity path (ARCHITECTURE.md
    'Compile-time notes')."""
    return os.environ.get("FADTK_TPU_SCAN_LAYERS", "") == "1"


def _gelu(x):
    # Exact erf in f32 (HF parity); tanh-approx in bf16 (precision.gelu —
    # erf measured 52 ms of a 300 ms w2v2-base forward on the VPU).
    from ..precision import gelu

    return gelu(x)


def _layer_norm(x, p, eps):
    # Statistics in float32 regardless of compute dtype (bf16 fast mode).
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# --------------------------------------------------------------------------- #
# Conv feature extractor
# --------------------------------------------------------------------------- #


def _conv1d(x, kernel, stride, bias=None, padding="VALID", groups=1):
    """x: (B, T, C_in); kernel: (K, C_in/groups, C_out)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias
    return y


def _masked_group_norm_per_channel(x, mask, p, eps=1e-5):
    """GroupNorm with num_groups == num_channels == per-channel instance norm
    over time (HF Wav2Vec2GroupNormConvLayer), with statistics restricted to
    valid frames so padded batches match unpadded runs exactly.

    x: (B, T, C); mask: (B, T) in {0,1}.

    bf16 fast mode computes the moments in ONE traversal with f32
    accumulation (the conv-0 output is the biggest tensor in the forward —
    (B, ~T/5, 512) — and this norm walks it three times on the two-pass
    form): whole-model w2v2-base bf16 173.4 -> 168.3 ms, +3%
    (scripts/groupnorm_onepass_probe.py). Masked exactness is unchanged
    (padded positions contribute exactly zero to both sums). float32 keeps
    the two-pass centered form — E[x^2]-E[x]^2 cancels on the parity path
    (same analysis as EnCodec-48k's group norm, PERF.md ledger).
    """
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    if x.dtype == jnp.bfloat16:
        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32 * m, axis=1, keepdims=True)
        s2 = jnp.sum(jnp.square(x32) * m, axis=1, keepdims=True)
        mean = s1 / n
        # clamp: one-pass cancellation can dip below -eps on near-constant
        # channels and NaN the rsqrt
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)
    mean = jnp.sum(x * m, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / n
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def _feature_extractor_single(cfg, params, audio, num_valid):
    """(T,) audio, scalar valid length -> (T_frames, C), (T_frames,) mask."""
    x = audio[None, :, None]
    valid = num_valid
    t = x.shape[1]
    for i in range(len(cfg.conv_kernel)):
        layer = params["conv_layers"][i]
        k, s = cfg.conv_kernel[i], cfg.conv_stride[i]
        x = _conv1d(x, layer["conv"]["kernel"], s, layer["conv"].get("bias"))
        valid = (valid - k) // s + 1
        t = x.shape[1]
        mask = (jnp.arange(t) < valid).astype(x.dtype)[None, :]
        if cfg.feat_extract_norm == "group" and i == 0:
            x = _masked_group_norm_per_channel(x, mask, layer["layer_norm"])
        elif cfg.feat_extract_norm == "layer":
            x = _layer_norm(x, layer["layer_norm"], cfg.layer_norm_eps)
        x = _gelu(x)
    return x[0], (jnp.arange(t) < valid).astype(x.dtype), valid


# --------------------------------------------------------------------------- #
# Positional conv embedding
# --------------------------------------------------------------------------- #


def pos_conv_embedding(cfg: SpeechEncoderConfig, p, x):
    """Grouped conv positional embedding with SAME-style padding and the
    even-kernel trailing-sample trim (HF Wav2Vec2PositionalConvEmbedding +
    SamePadLayer). Input must already have padded frames zeroed."""
    pad = cfg.num_conv_pos_embeddings // 2
    y = _conv1d(
        x,
        p["kernel"],
        1,
        p["bias"],
        padding=[(pad, pad)],
        groups=cfg.num_conv_pos_embedding_groups,
    )
    if cfg.num_conv_pos_embeddings % 2 == 0:
        y = y[:, :-1, :]
    return _gelu(y)


# --------------------------------------------------------------------------- #
# Attention
# --------------------------------------------------------------------------- #


def _split_heads(x, num_heads):
    b, t, h = x.shape
    return x.reshape(b, t, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _attention_core(q, k, v, bias):
    """q,k,v: (B, H, T, D); bias: additive (B, H, T, T) or broadcastable.

    Logits/softmax stay in float32 (f32 MXU accumulation) so the bf16 fast
    mode keeps a stable attention distribution.
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", w, v, preferred_element_type=jnp.float32)
    b, h, t, d = out.shape
    return out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, t, h * d)


_FLASH_F32_MIN_T = 640


def use_flash_attention(dtype, frame_valid, t: int | None = None) -> bool:
    """Which attention lowering serves this dtype/length (all measured,
    B=128/H=12/d=64 on v5e — scripts/flash_fastmath_probe.py):

    - bf16: always the fused Pallas kernel. The XLA path materializes
      (B, H, T, T) f32 logits plus cast roundtrips and is 1.5x SLOWER than
      f32 there; the kernel wins (7.4 ms vs 13.0 ms at T=499).
    - f32, T=499 (16 kHz 10 s bucket): XLA keeps it (8.1 ms vs 10.7 ms for
      the kernel — XLA's fused softmax avoids the kernel's f32 VMEM
      pressure and there is no padding to save).
    - f32, long buckets: stays XLA by default, but for a different reason
      than the first verdict. The per-(b,h) kernel lost the whole-model A/B
      (MERT f32 455.9 ms vs 431.4 XLA, -5.7% — in-model XLA fuses
      logits/softmax with the surrounding projections). The PACKED kernel
      re-probe (scripts/speech_flash_f32_probe.py) flips that: whole-model
      MERT f32 520.0 -> 476.6 ms (+9.1%), w2v2 T=499 a tie (1.006x). It
      stays off because device-f32 is the HF-parity numerics contract and
      the online softmax reorders sums (~1e-6 relative) — a single-family
      +9% is not worth forking the parity mode's numerics from the
      CPU-tested path. ``FADTK_TPU_FLASH_F32=1`` (optional min length
      ``FADTK_TPU_FLASH_F32_MIN_T``, default 640) opts in; it now routes
      to the packed kernel like bf16.

    Measured dead ends kept as knobs on flash_attention(): fast_exp (bf16
    VPU exp: 7.389 -> 7.397 ms, the kernel is not exp-throughput-bound
    even though bf16 exp micro-probes 1.8x f32) and fast_dot
    (10.84 -> 10.69 ms, Mosaic's f32 dots were not the gap either).
    """
    from ...ops.flash_attention import flash_attention_enabled

    if frame_valid is None or not flash_attention_enabled():
        return False
    if dtype == jnp.bfloat16:
        return True
    if dtype == jnp.float32 and t is not None:
        import os

        if os.environ.get("FADTK_TPU_FLASH_F32", "").strip() == "1":
            raw = os.environ.get("FADTK_TPU_FLASH_F32_MIN_T", "").strip()
            return t >= (int(raw) if raw.isdigit() else _FLASH_F32_MIN_T)
    return False


def standard_attention(cfg: SpeechEncoderConfig, p, x, key_bias, frame_valid=None):
    q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
    k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
    v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
    if use_flash_attention(x.dtype, frame_valid, x.shape[1]):
        # Packed-heads kernel: consumes the projection layout directly —
        # no (B, H, T, D) transposes, and DMA rows are H*D*itemsize
        # contiguous instead of 128 bytes. Isolated A/B at B=128/H=12/T=499
        # bf16: 7.98 ms (per-(b,h) kernel + transposes) -> 4.74 ms.
        from ...ops.flash_attention import flash_attention_packed

        out = flash_attention_packed(q, k, v, frame_valid, num_heads=cfg.num_heads)
    else:
        qh, kh, vh = (
            _split_heads(t, cfg.num_heads) for t in (q, k, v)
        )
        out = _attention_core(qh, kh, vh, key_bias)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def _wavlm_relative_buckets(num_buckets: int, max_distance: int, t: int) -> np.ndarray:
    """T5-style log-spaced relative position buckets (HF WavLMAttention
    ._relative_positions_bucket); static per sequence length."""
    half = num_buckets // 2
    rel = np.arange(t)[None, :] - np.arange(t)[:, None]  # memory - context
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


def wavlm_position_bias(cfg: SpeechEncoderConfig, rel_attn_embed, t: int):
    """(H, T, T) un-gated relative position bias from the layer-0 embedding."""
    buckets = jnp.asarray(_wavlm_relative_buckets(cfg.num_buckets, cfg.max_bucket_distance, t))
    values = jnp.take(rel_attn_embed, buckets, axis=0)  # (T, T, H)
    return values.transpose(2, 0, 1)


def wavlm_attention(cfg: SpeechEncoderConfig, p, x, key_bias, position_bias, frame_valid=None):
    """WavLM gated relative position bias attention (HF WavLMAttention).

    The gate is computed from the *unprojected* per-head hidden states:
    proj -> (..., 2, 4).sum(-1) -> sigmoid -> a * (b * const - 1) + 2.

    bf16 fast mode: the bias factorizes as gate(B,H,T) ⊙ position_bias(H,T,T),
    so the fused kernel streams it without ever materializing the dense
    (B, H, T, T) term (ops/flash_attention.py); the key_bias prefix mask is
    the kernel's n_valid. f32 stays on XLA for HF parity.
    """
    b, t, _ = x.shape
    # Gate computed in (B, T, H) layout: the projection contracts head_dim in
    # place (same dot, no (B,T,H,hd)->(B,H,T,hd) transpose materialized), and
    # the packed flash kernel consumes (B, T, H) directly — the bf16 path runs
    # transpose-free. Bit-identical to the (B,H,T) formulation (same
    # contraction; tests/test_hf_differential.py covers HF parity).
    hs = x.reshape(b, t, cfg.num_heads, cfg.head_dim)
    proj = (
        jnp.einsum("bthd,de->bthe", hs, p["gru_rel_pos_linear"]["kernel"])
        + p["gru_rel_pos_linear"]["bias"]
    )
    proj = proj.reshape(b, t, cfg.num_heads, 2, 4).sum(-1)
    gates = jax.nn.sigmoid(proj)
    gate_a, gate_b = gates[..., 0], gates[..., 1]  # (B, T, H)
    const = p["gru_rel_pos_const"].reshape(1, 1, cfg.num_heads)
    gate_bth = gate_a * (gate_b * const - 1.0) + 2.0  # (B, T, H)

    q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
    k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
    v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
    # WavLM f32 stays XLA at every length (the factorized-bias kernel is
    # unmeasured in f32; bias blocks double the kernel's VMEM traffic).
    if x.dtype == jnp.bfloat16 and use_flash_attention(x.dtype, frame_valid):
        # Packed-heads kernel with streamed factorized bias: consumes the
        # projection layout (no head transposes, wide DMA rows) and the
        # (H, BQ, BK) position-bias slabs. Whole-model A/B vs the per-(b,h)
        # bias kernel: scripts/wavlm_packed_probe.py.
        from ...ops.flash_attention import flash_attention_packed

        out = flash_attention_packed(
            q, k, v, frame_valid,
            position_bias.astype(jnp.float32),
            gate_bth.astype(jnp.float32),  # (B, T, H)
            num_heads=cfg.num_heads,
        )
    else:
        qh, kh, vh = (_split_heads(y, cfg.num_heads) for y in (q, k, v))
        gate = gate_bth.transpose(0, 2, 1)  # (B, H, T)
        gated_bias = gate[..., None] * position_bias[None]  # (B, H, T, T)
        out = _attention_core(qh, kh, vh, gated_bias + key_bias)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


# --------------------------------------------------------------------------- #
# Encoder layers
# --------------------------------------------------------------------------- #


def _feed_forward(p, x):
    h = _gelu(x @ p["intermediate_dense"]["kernel"] + p["intermediate_dense"]["bias"])
    return h @ p["output_dense"]["kernel"] + p["output_dense"]["bias"]


def encoder_layer(cfg: SpeechEncoderConfig, p, x, key_bias, position_bias, frame_valid=None):
    if cfg.attention_type == "wavlm":
        attn = lambda y: wavlm_attention(
            cfg, p["attention"], y, key_bias, position_bias, frame_valid
        )
    else:
        attn = lambda y: standard_attention(cfg, p["attention"], y, key_bias, frame_valid)

    if cfg.do_stable_layer_norm:
        # Pre-norm (HF Wav2Vec2EncoderLayerStableLayerNorm).
        x = x + attn(_layer_norm(x, p["layer_norm"], cfg.layer_norm_eps))
        x = x + _feed_forward(
            p["feed_forward"], _layer_norm(x, p["final_layer_norm"], cfg.layer_norm_eps)
        )
    else:
        # Post-norm (HF Wav2Vec2EncoderLayer).
        x = _layer_norm(x + attn(x), p["layer_norm"], cfg.layer_norm_eps)
        x = _layer_norm(
            x + _feed_forward(p["feed_forward"], x), p["final_layer_norm"], cfg.layer_norm_eps
        )
    return x


# --------------------------------------------------------------------------- #
# Full forward
# --------------------------------------------------------------------------- #


def speech_encoder_forward(
    cfg: SpeechEncoderConfig,
    params,
    audio: jax.Array,
    num_valid: jax.Array | None = None,
    taps: tuple[int, ...] | None = None,
):
    """Full forward pass.

    Args:
        audio: (B, T_samples) float32, zero-padded to a bucket length.
        num_valid: (B,) int32 true sample counts (defaults to full length).
        taps: hidden-state indices to return (None = all num_layers + 1).
            Passing a single tap avoids materializing the full stacked states
            (13x activation HBM traffic) on the throughput path.

    Compute dtype follows the parameter dtype: cast params to bfloat16 for the
    fast mode (norm statistics, attention logits and MXU accumulation stay
    float32). Float32 params give reference-parity numerics.

    Returns:
        hidden_states: (len(taps) or num_layers + 1, B, T_frames, H) — HF's
            output_hidden_states tuple, stacked (reference selects one layer,
            fadtk/model_loader.py:556-557).
        frame_mask: (B, T_frames) validity mask.
    """
    b, t_samples = audio.shape
    if num_valid is None:
        num_valid = jnp.full((b,), t_samples, jnp.int32)

    compute_dtype = params["feature_projection"]["projection"]["kernel"].dtype

    if cfg.do_normalize:
        # HF Wav2Vec2FeatureExtractor zero-mean/unit-var per utterance over
        # *valid* samples (padding excluded), eps 1e-7. Float32 statistics.
        audio = audio.astype(jnp.float32)
        smask = (jnp.arange(t_samples)[None, :] < num_valid[:, None]).astype(audio.dtype)
        n = jnp.maximum(num_valid.astype(audio.dtype), 1.0)[:, None]
        mean = jnp.sum(audio * smask, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(audio - mean) * smask, axis=1, keepdims=True) / n
        audio = (audio - mean) / jnp.sqrt(var + 1e-7) * smask
    audio = audio.astype(compute_dtype)

    feats, frame_mask, frame_valid = jax.vmap(
        lambda a, nv: _feature_extractor_single(cfg, params["feature_extractor"], a, nv)
    )(audio, num_valid)
    # feats: (B, T_frames, C_last); frame_mask: (B, T_frames); frame_valid: (B,)

    fp = params["feature_projection"]
    x = feats
    if cfg.feat_proj_layer_norm:
        x = _layer_norm(x, fp["layer_norm"], cfg.layer_norm_eps)
    x = x @ fp["projection"]["kernel"] + fp["projection"]["bias"]

    # Zero padded frames so the positional conv sees the same zeros an unpadded
    # run would have (HF zeroes them when an attention mask is passed).
    x = x * frame_mask[..., None]

    enc = params["encoder"]
    x = x + pos_conv_embedding(cfg, enc["pos_conv"], x)
    if not cfg.do_stable_layer_norm:
        x = _layer_norm(x, enc["layer_norm"], cfg.layer_norm_eps)

    # Additive key mask: large negative on padded keys (HF _prepare_4d mask).
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    key_bias = (1.0 - frame_mask)[:, None, None, :] * neg

    t_frames = x.shape[1]
    if cfg.attention_type == "wavlm":
        position_bias = wavlm_position_bias(
            cfg, enc["layers"][0]["attention"]["rel_attn_embed"], t_frames
        )
    else:
        position_bias = None

    wanted = set(range(cfg.num_layers + 1)) if taps is None else set(taps)
    collected: dict[int, jax.Array] = {}
    if 0 in wanted:
        collected[0] = x
    last_idx = cfg.num_layers
    n_run = max(wanted)
    if scan_layers_enabled() and n_run > 0:
        layers = enc["layers"][:n_run]
        if cfg.attention_type == "wavlm":
            # The layer-0-only relative bias table (already consumed by
            # position_bias above) breaks pytree homogeneity — drop it so the
            # layers stack for scan.
            layers = [
                {**l, "attention": {k: v for k, v in l["attention"].items()
                                    if k != "rel_attn_embed"}}
                for l in layers
            ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

        def body(carry, p):
            y = encoder_layer(cfg, p, carry, key_bias, position_bias, frame_valid)
            return y, y

        if any(0 < i < n_run for i in wanted):
            x, ys = jax.lax.scan(body, x, stacked)  # ys: (n_run, B, T, H)
            for i in wanted:
                if i > 0:
                    collected[i] = ys[i - 1]
        else:
            # Single-tap throughput path: carry only — no (L, B, T, H) stack.
            x, _ = jax.lax.scan(lambda c, p: (body(c, p)[0], None), x, stacked)
            collected[n_run] = x
    else:
        for i, p in enumerate(enc["layers"][:n_run], start=1):
            x = encoder_layer(cfg, p, x, key_bias, position_bias, frame_valid)
            if i in wanted:
                collected[i] = x

    if cfg.do_stable_layer_norm and last_idx in collected:
        collected[last_idx] = _layer_norm(
            collected[last_idx], enc["layer_norm"], cfg.layer_norm_eps
        )

    order = sorted(collected) if taps is None else list(taps)
    return jnp.stack([collected[i] for i in order], axis=0), frame_mask


# --------------------------------------------------------------------------- #
# Random init (testing / benchmarks without checkpoints)
# --------------------------------------------------------------------------- #


def init_speech_encoder_params(cfg: SpeechEncoderConfig, key, dtype=jnp.float32):
    """Random parameter pytree with the exact tree structure the torch
    converter produces (fadtk_tpu.weights.speech)."""
    keys = iter(jax.random.split(key, 4096))

    def dense(i, o, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(i)
        return {
            "kernel": jax.random.uniform(next(keys), (i, o), dtype, -s, s),
            "bias": jnp.zeros((o,), dtype),
        }

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    conv_layers = []
    in_ch = 1
    for i, out_ch in enumerate(cfg.conv_dim):
        k = cfg.conv_kernel[i]
        layer = {
            "conv": {
                "kernel": jax.random.normal(next(keys), (k, in_ch, out_ch), dtype)
                * (0.5 / math.sqrt(k * in_ch))
            }
        }
        if cfg.conv_bias:
            layer["conv"]["bias"] = jnp.zeros((out_ch,), dtype)
        if (cfg.feat_extract_norm == "group" and i == 0) or cfg.feat_extract_norm == "layer":
            layer["layer_norm"] = ln(out_ch)
        conv_layers.append(layer)
        in_ch = out_ch

    h = cfg.hidden_size
    pos_kernel = jax.random.normal(
        next(keys),
        (cfg.num_conv_pos_embeddings, h // cfg.num_conv_pos_embedding_groups, h),
        dtype,
    ) * 0.02

    def attn_params(first_layer: bool):
        p = {
            "q_proj": dense(h, h),
            "k_proj": dense(h, h),
            "v_proj": dense(h, h),
            "out_proj": dense(h, h),
        }
        if cfg.attention_type == "wavlm":
            p["gru_rel_pos_const"] = jnp.ones((cfg.num_heads,), dtype)
            p["gru_rel_pos_linear"] = dense(cfg.head_dim, 8)
            if first_layer:
                p["rel_attn_embed"] = (
                    jax.random.normal(next(keys), (cfg.num_buckets, cfg.num_heads), dtype) * 0.02
                )
        return p

    layers = [
        {
            "attention": attn_params(i == 0),
            "layer_norm": ln(h),
            "feed_forward": {
                "intermediate_dense": dense(h, cfg.intermediate_size),
                "output_dense": dense(cfg.intermediate_size, h),
            },
            "final_layer_norm": ln(h),
        }
        for i in range(cfg.num_layers)
    ]

    params = {
        "feature_extractor": {"conv_layers": conv_layers},
        "feature_projection": {
            "projection": dense(cfg.conv_dim[-1], h),
        },
        "encoder": {
            "pos_conv": {"kernel": pos_kernel, "bias": jnp.zeros((h,), dtype)},
            "layer_norm": ln(h),
            "layers": layers,
        },
    }
    if cfg.feat_proj_layer_norm:
        params["feature_projection"]["layer_norm"] = ln(cfg.conv_dim[-1])
    return params
