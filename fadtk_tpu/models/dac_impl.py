"""Functional JAX implementation of the Descript Audio Codec (DAC) encoder.

Parity target: descript-audio-codec's 44 kHz encoder as used by the reference
(fadtk/model_loader.py:189-251) — the continuous pre-quantization latents.

Architecture (descript-audio-codec dac/model/dac.py):
    Encoder: WNConv1d(1, d, k7, p3)
             for each stride s in (2, 4, 8, 8):
                 EncoderBlock(d*2, s) = ResidualUnit(d, dil 1, 3, 9) x3,
                                        Snake1d(d), WNConv1d(d, 2d, k=2s, s, p=ceil(s/2))
             Snake1d, WNConv1d(1024, latent_dim=1024, k3, p1)
    ResidualUnit(d, dil): Snake1d -> WNConv1d(d, d, k7, dil, p=3*dil) ->
                          Snake1d -> WNConv1d(d, d, k1); residual add.
    Snake activation: x + sin(alpha x)^2 / (alpha + 1e-9), per-channel alpha.

Weight-normed convs are materialized at conversion. All padding is plain
symmetric zero padding (torch Conv1d), so shapes are static and batching the
5 s analysis windows is a single MXU-friendly forward.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DACEncoderConfig:
    d_model: int = 64
    strides: tuple[int, ...] = (2, 4, 8, 8)
    latent_dim: int = 1024  # encoder_dim * 2**len(strides) for the 44k model

    @property
    def hop_length(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


DAC_44K = DACEncoderConfig()


def _snake(x, alpha):
    """x: (B, C, T); alpha: (C,): x + reciprocal(alpha + 1e-9) * sin(alpha x)^2
    — the reciprocal-multiply form is literally what descript-audio-codec
    computes (mirrored in tests/test_dac.py:33).

    The sin is the Cody-Waite polynomial (ops/fastmath.sin_cw) by default:
    XLA:TPU's conservative full-range sin made snake 65% of the whole DAC
    forward (55.7 of 86.0 ms — scripts/conv_family_ablation_probe.py); the
    polynomial runs the model at 32.9 ms (2.6x) with a 1.26e-4 max latent
    deviation, inside the 2e-4 torch-mirror test budget and ~10x below the
    float16 embedding-cache quantization (scripts/snake_norm_probe.py).
    FADTK_TPU_EXACT_SIN=1 restores the XLA builtin — read at TRACE time,
    so set it before the first DAC forward of the process (the lru-cached
    jitted encoder keeps whichever sin it was traced with)."""
    import os

    a = alpha[None, :, None]
    if os.environ.get("FADTK_TPU_EXACT_SIN", "").strip() == "1":
        s = jnp.sin(a * x)
    else:
        from ..ops.fastmath import sin_cw

        s = sin_cw(a * x)
    inv = 1.0 / (alpha + 1e-9)
    return x + inv[None, :, None] * jnp.square(s)


def _conv(p, x, stride=1, dilation=1, padding=0):
    # ops/conv1d.py: XLA conv by default (whole-model A/B winner); the
    # framed-GEMM lowering is the FADTK_TPU_CONV_LOWERING=gemm rescue for
    # pathological remote conv compiles (see ops/conv1d.py docstring).
    from ..ops.conv1d import conv1d_ncl

    if padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    return conv1d_ncl(x, p["kernel"], stride=stride, dilation=dilation) + (
        p["bias"][None, :, None]
    )


def _residual_unit(p, x, dilation):
    y = _snake(x, p["alpha1"])
    y = _conv(p["conv1"], y, dilation=dilation, padding=3 * dilation)
    y = _snake(y, p["alpha2"])
    y = _conv(p["conv2"], y)
    pad = (x.shape[-1] - y.shape[-1]) // 2
    if pad > 0:
        x = x[..., pad:-pad]
    return x + y


def dac_encode(cfg: DACEncoderConfig, params, audio: jax.Array) -> jax.Array:
    """(B, 1, T) -> (B, T_frames, latent_dim) continuous latents.

    Compute follows the parameter dtype (models/precision.py); float32 out.
    (DAC pinned f32 through round 3; the Cody-Waite snake removed the
    dtype-independent sin bottleneck and bf16 now buys +14%, so the pin is
    lifted — see DACModel.)
    """
    from .precision import param_dtype

    x = _conv(params["conv_in"], audio.astype(param_dtype(params)), padding=3)
    for i, stride in enumerate(cfg.strides):
        block = params["blocks"][i]
        for j, dil in enumerate((1, 3, 9)):
            x = _residual_unit(block["res"][j], x, dil)
        x = _snake(x, block["alpha"])
        x = _conv(block["down"], x, stride=stride, padding=math.ceil(stride / 2))
    x = _snake(x, params["alpha_out"])
    x = _conv(params["conv_out"], x, padding=1)
    return x.transpose(0, 2, 1).astype(jnp.float32)


def init_dac_params(cfg: DACEncoderConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))

    def conv(cin, cout, k):
        s = 1.0 / math.sqrt(k * cin)
        return {
            "kernel": jax.random.uniform(next(keys), (cout, cin, k), dtype, -s, s),
            "bias": jnp.zeros((cout,), dtype),
        }

    def res_unit(dim):
        return {
            "alpha1": jnp.ones((dim,), dtype),
            "conv1": conv(dim, dim, 7),
            "alpha2": jnp.ones((dim,), dtype),
            "conv2": conv(dim, dim, 1),
        }

    blocks = []
    d = cfg.d_model
    for stride in cfg.strides:
        blocks.append(
            {
                "res": [res_unit(d) for _ in range(3)],
                "alpha": jnp.ones((d,), dtype),
                "down": conv(d, d * 2, 2 * stride),
            }
        )
        d *= 2
    return {
        "conv_in": conv(1, cfg.d_model, 7),
        "blocks": blocks,
        "alpha_out": jnp.ones((d,), dtype),
        "conv_out": conv(d, cfg.latent_dim, 3),
    }
