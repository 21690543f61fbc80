"""Functional JAX implementation of the EnCodec SEANet encoder.

Parity target: the continuous (pre-quantization) encoder latents the reference
extracts via ``model.encoder(audio)`` (reference fadtk/model_loader.py:154-163)
— bandwidth/quantizer/decoder are irrelevant for FAD embeddings.

Semantics match HF transformers' EncodecModel (itself weight/parity-identical to
facebookresearch/encodec), differential-tested in tests/test_encodec.py:

- convs with causal (24k) or asymmetric (48k) 'same'-style padding, including
  the ceil-to-full-frames extra right padding, reflect mode with the
  small-input guard;
- weight norm (24k, materialized at conversion) or time group norm (48k);
- ELU activations, residual blocks with conv shortcuts;
- a 2-layer LSTM with skip connection before the final projection. The
  input-to-hidden GEMM of each LSTM layer is hoisted out of the time scan
  (one big MXU matmul); only the small recurrent matmul stays sequential.

Shapes are static per input length; the model classes feed exact-length audio
so padding semantics (reflection of the true signal tail) match the reference
bit-for-bit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncodecEncoderConfig:
    audio_channels: int = 1
    num_filters: int = 32
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    compress: int = 2
    hidden_size: int = 128
    num_lstm_layers: int = 2
    use_causal_conv: bool = True
    norm_type: str = "weight_norm"  # or "time_group_norm"
    pad_mode: str = "reflect"
    use_conv_shortcut: bool = True

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))


CONFIG_24K = EncodecEncoderConfig()
CONFIG_48K = EncodecEncoderConfig(
    audio_channels=2, use_causal_conv=False, norm_type="time_group_norm"
)


# --------------------------------------------------------------------------- #
# Layer plan: mirrors HF EncodecEncoder.layers ModuleList indices, so converted
# parameters keep the upstream indexing.
# --------------------------------------------------------------------------- #


def encoder_plan(cfg: EncodecEncoderConfig) -> list[tuple]:
    """[(kind, hf_index, meta)] — kinds: conv / resnet / elu / lstm."""
    plan: list[tuple] = []
    i = 0

    def emit(kind, meta=None):
        nonlocal i
        plan.append((kind, i, meta or {}))
        i += 1

    emit("conv", dict(k=cfg.kernel_size, stride=1, dil=1))
    scaling = 1
    for ratio in reversed(cfg.upsampling_ratios):
        for j in range(cfg.num_residual_layers):
            emit("resnet", dict(dilations=(cfg.dilation_growth_rate**j, 1)))
        emit("elu")
        emit("conv", dict(k=ratio * 2, stride=ratio, dil=1))
        scaling *= 2
    emit("lstm")
    emit("elu")
    emit("conv", dict(k=cfg.last_kernel_size, stride=1, dil=1))
    return plan


# --------------------------------------------------------------------------- #
# Building blocks (all NCT layout like upstream, x: (B, C, T))
# --------------------------------------------------------------------------- #


def _pad1d(x, pad_left: int, pad_right: int, mode: str):
    """HF EncodecConv1d._pad1d, incl. the reflect small-input guard."""
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)))
    length = x.shape[-1]
    max_pad = max(pad_left, pad_right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, 0), (0, extra)))
    y = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="reflect")
    if extra:
        y = y[..., : y.shape[-1] - extra]
    return y


def _conv_layer(cfg, p, x, k: int, stride: int, dil: int):
    k_eff = (k - 1) * dil + 1
    padding_total = k_eff - stride
    length = x.shape[-1]
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    extra = ideal - length

    if cfg.use_causal_conv:
        x = _pad1d(x, padding_total, extra, cfg.pad_mode)
    else:
        pad_r = padding_total // 2
        x = _pad1d(x, padding_total - pad_r, pad_r + extra, cfg.pad_mode)

    # ops/conv1d.py: XLA conv by default (whole-model A/B winner); the
    # framed-GEMM lowering is the FADTK_TPU_CONV_LOWERING=gemm rescue for
    # pathological remote conv compiles (see ops/conv1d.py docstring).
    from ..ops.conv1d import conv1d_ncl

    y = conv1d_ncl(x, p["kernel"], stride=stride, dilation=dil) + p["bias"][None, :, None]

    if cfg.norm_type == "time_group_norm":
        # GroupNorm(1, C): normalize over (C, T) jointly per sample. The
        # norm is 44% of the whole 48k bf16 forward (9.7 of 21.9 ms —
        # scripts/conv_family_ablation_probe.py), so the bf16 throughput
        # mode computes the moments in ONE traversal (m1, m2 with f32
        # accumulation; 21.7 -> 17.3 ms whole-model). float32 keeps the
        # two-pass mean/var: the one-pass form cancels catastrophically
        # there (E[y^2] - E[y]^2 measured 1.4e-2 off on the parity path,
        # vs the 3e-4 differential-test budget), while under bf16 the
        # difference drowns in the mode's own 8e-3 rounding.
        if y.dtype == jnp.bfloat16:
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
            m2 = jnp.mean(y32 * y32, axis=(1, 2), keepdims=True)
            # clamp: on a near-constant segment the one-pass form's f32
            # cancellation can dip below -1e-5 and NaN the rsqrt
            var = jnp.maximum(m2 - mean * mean, 0.0)
            y = ((y32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)
        else:
            mean = jnp.mean(y, axis=(1, 2), keepdims=True)
            var = jnp.var(y, axis=(1, 2), keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * p["norm_scale"][None, :, None] + p["norm_bias"][None, :, None]
    return y


def _resnet_block(cfg, p, x, dilations):
    # FADTK_TPU_FUSED_RESNET=1 runs the 24k-class block (causal, reflect,
    # k=3, dil 1, k=1 shortcut, no in-conv norm) as one VMEM-resident
    # Pallas kernel — a measured DEAD END kept reproducible: whole-model
    # f32 76.5 -> 119.4 ms (0.64x); the block is VPU+MXU-pass bound, not
    # HBM-bound (full post-mortem in ops/fused_resnet.py). Default off.
    from ..ops.fused_resnet import fused_resnet_causal, fused_resnet_enabled

    if (
        fused_resnet_enabled()
        and cfg.use_causal_conv
        and cfg.pad_mode == "reflect"
        and cfg.norm_type == "weight_norm"
        and cfg.residual_kernel_size == 3
        and dilations[0] == 1
        and cfg.use_conv_shortcut
        and x.shape[-1] >= 3
    ):
        return fused_resnet_causal(
            x,
            p["block_conv1"]["kernel"],
            p["block_conv1"]["bias"],
            p["block_conv2"]["kernel"][:, :, 0],
            p["block_conv2"]["bias"],
            p["shortcut"]["kernel"][:, :, 0],
            p["shortcut"]["bias"],
        )

    r = x
    h = jax.nn.elu(x)
    h = _conv_layer(cfg, p["block_conv1"], h, cfg.residual_kernel_size, 1, dilations[0])
    h = jax.nn.elu(h)
    h = _conv_layer(cfg, p["block_conv2"], h, 1, 1, 1)
    if cfg.use_conv_shortcut:
        r = _conv_layer(cfg, p["shortcut"], r, 1, 1, 1)
    return r + h


def _lstm(cfg, p, x):
    """2-layer LSTM with skip (HF EncodecLSTM). x: (B, C, T)."""
    h0 = x.transpose(2, 0, 1)  # (T, B, C)
    seq = h0
    for layer in p["layers"]:
        w_ih, w_hh = layer["w_ih"], layer["w_hh"]  # (4H, in), (4H, H)
        bias = layer["b_ih"] + layer["b_hh"]
        hdim = w_hh.shape[1]
        # Hoist the input projection out of the recurrence: one big GEMM.
        xi = jnp.einsum("tbc,gc->tbg", seq, w_ih, preferred_element_type=seq.dtype) + bias

        def step(carry, xi_t):
            h, c = carry
            gates = xi_t + h @ w_hh.T
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f_g) * c + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
            return (h, c), h

        b = seq.shape[1]
        init = (jnp.zeros((b, hdim), seq.dtype), jnp.zeros((b, hdim), seq.dtype))
        _, seq = jax.lax.scan(step, init, xi)
    return (seq + h0).transpose(1, 2, 0)


def encodec_encode(cfg: EncodecEncoderConfig, params, audio: jax.Array) -> jax.Array:
    """(B, channels, T) -> (B, T_frames, hidden_size) continuous latents.

    Compute follows the parameter dtype (identity for float32 params; the
    opt-in bf16 fast mode casts params — models/precision.py); latents return
    as float32 for the fixed f16 cache format either way.
    """
    from .precision import param_dtype

    x = audio.astype(param_dtype(params))
    for kind, idx, meta in encoder_plan(cfg):
        p = params["layers"].get(str(idx))
        if kind == "conv":
            x = _conv_layer(cfg, p, x, meta["k"], meta["stride"], meta["dil"])
        elif kind == "resnet":
            x = _resnet_block(cfg, p, x, meta["dilations"])
        elif kind == "elu":
            x = jax.nn.elu(x)
        elif kind == "lstm":
            x = _lstm(cfg, p, x)
    return x.transpose(0, 2, 1).astype(jnp.float32)


# --------------------------------------------------------------------------- #
# Random init (tests / benchmarks)
# --------------------------------------------------------------------------- #


def init_encodec_params(cfg: EncodecEncoderConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))

    def conv(cin, cout, k):
        s = 1.0 / math.sqrt(k * cin)
        p = {
            "kernel": jax.random.uniform(next(keys), (cout, cin, k), dtype, -s, s),
            "bias": jnp.zeros((cout,), dtype),
        }
        if cfg.norm_type == "time_group_norm":
            p["norm_scale"] = jnp.ones((cout,), dtype)
            p["norm_bias"] = jnp.zeros((cout,), dtype)
        return p

    def lstm(dim):
        def layer():
            s = 1.0 / math.sqrt(dim)
            return {
                "w_ih": jax.random.uniform(next(keys), (4 * dim, dim), dtype, -s, s),
                "w_hh": jax.random.uniform(next(keys), (4 * dim, dim), dtype, -s, s),
                "b_ih": jnp.zeros((4 * dim,), dtype),
                "b_hh": jnp.zeros((4 * dim,), dtype),
            }

        return {"layers": [layer() for _ in range(cfg.num_lstm_layers)]}

    layers = {}
    scaling = 1
    cin = cfg.audio_channels
    for kind, idx, meta in encoder_plan(cfg):
        cur = scaling * cfg.num_filters
        if kind == "conv":
            if idx == 0:
                layers[str(idx)] = conv(cfg.audio_channels, cfg.num_filters, meta["k"])
                cin = cfg.num_filters
            elif meta["stride"] > 1:
                layers[str(idx)] = conv(cur, cur * 2, meta["k"])
                scaling *= 2
                cin = cur * 2
            else:  # final projection
                layers[str(idx)] = conv(cur, cfg.hidden_size, meta["k"])
        elif kind == "resnet":
            hidden = cur // cfg.compress
            layers[str(idx)] = {
                "block_conv1": conv(cur, hidden, cfg.residual_kernel_size),
                "block_conv2": conv(hidden, cur, 1),
                **({"shortcut": conv(cur, cur, 1)} if cfg.use_conv_shortcut else {}),
            }
        elif kind == "lstm":
            layers[str(idx)] = lstm(cur)
    return {"layers": layers}
