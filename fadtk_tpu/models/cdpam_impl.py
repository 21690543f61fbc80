"""CDPAM base-encoder: functional JAX implementation.

Parity target: the ``base_encoder`` ("lossnet") of the CDPAM perceptual metric
(pranaymanocha/PerceptualAudio, pip package ``cdpam``), as invoked by the
reference at fadtk/model_loader.py:437-445:

    _, acoustic, content = model.model.base_encoder.forward(chunk.unsqueeze(1))

i.e. the forward takes a ``(batch, 1, samples)`` raw waveform at int16 scale
(the reference's load_wav multiplies the float audio by 32768,
fadtk/model_loader.py:451-460) and returns a 3-tuple whose second and third
elements are the 512-d acoustic and content embeddings.

ARCHITECTURE PROVENANCE — read before trusting numerics. The cdpam package and
its checkpoints are unavailable in this offline environment, so this module is
a best-effort reconstruction from the CDPAM paper (arXiv:2102.05109, ICASSP'21)
and its DPAM lineage (arXiv:2001.04460):

- a strided 1-D convolution stack (``encoder_layers=16`` layers of base width
  ``encoder_filters=64`` per the cdpam package defaults), channels doubling
  every 5 layers (DPAM's ``blk_channels=5`` convention: 64x5, 128x5, 256x5,
  512), kernel 3, stride 2, zero 'same' padding, each followed by BatchNorm
  (inference statistics) and LeakyReLU;
- a time-average pool to a single 512-d feature vector;
- two linear heads (acoustic / content) of output width 512.

What is *known* (from the reference call site): input scale, chunking, output
dims, the 3-tuple shape, and the downstream L2 normalization. What is
*reconstructed*: kernel size, stride placement, activation slope, norm flavor,
pooling, and head naming. The weight converter (fadtk_tpu/weights/cdpam.py)
therefore infers the layer geometry (channel widths, kernel size, head dims)
from the shapes found in a real checkpoint and stores them in ``__config__``
metadata, so a checkpoint whose geometry disagrees with these defaults loads
correctly without code changes. Numeric parity remains UNVERIFIED until a real
checkpoint is available — run the golden gate (fadtk_tpu.test) after
converting one.

TPU notes: all chunks pad to a static ``chunk_samples`` bucket with a valid
sample count; every layer re-zeros frames past the valid region, which makes
the padded batch bit-equal to running each ragged chunk alone (the invalid
frames a 'same'-padded conv computes from the zero tail are masked before they
can contaminate the next layer, and the mean pool divides by the true frame
count). One executable serves every chunk length.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CdpamConfig:
    channels: tuple = (64,) * 5 + (128,) * 5 + (256,) * 5 + (512,)
    kernel_size: int = 3
    stride: int = 2
    emb_dim: int = 512
    leaky_slope: float = 0.2
    bn_eps: float = 1e-5
    chunk_samples: int = 22050  # 1 s at 22.05 kHz (fadtk/model_loader.py:438)


DEFAULT_CONFIG = CdpamConfig()


def _conv1d_same(x: jax.Array, kernel: jax.Array, bias: jax.Array, stride: int):
    """(B, T, Cin) x (K, Cin, Cout) -> (B, ceil(T/stride), Cout).

    Padding matches torch Conv1d(k, stride, padding=(k-1)//2): out length
    floor((T + 2p - k)/s) + 1 = ceil(T/s) for odd k.
    """
    # ops/conv1d.py (channel-last twin): XLA conv by default (whole-model
    # A/B winner); FADTK_TPU_CONV_LOWERING=gemm is the rescue for
    # pathological remote conv compiles (see ops/conv1d.py docstring).
    from ..ops.conv1d import conv1d_nlc

    k = kernel.shape[0]
    p = (k - 1) // 2
    y = conv1d_nlc(
        jnp.pad(x, ((0, 0), (p, p), (0, 0))), kernel, stride=stride
    )
    return y + bias


def cdpam_forward(cfg: CdpamConfig, params, chunks: jax.Array, lengths: jax.Array):
    """Embed a batch of 1 s chunks.

    chunks: (B, chunk_samples) float32 at int16 scale, zero-padded past each
    chunk's valid length. lengths: (B,) int32 valid sample counts.
    Returns (features, acoustic, content): (B, C_last), (B, 512), (B, 512),
    float32 (compute follows the parameter dtype — models/precision.py; bf16
    fast mode measured +78% throughput, the stack is bandwidth-bound).
    """
    from .precision import param_dtype

    x = chunks.astype(param_dtype(params))[:, :, None]
    n = lengths.astype(jnp.int32)
    for conv, bn in zip(params["convs"], params["norms"]):
        x = _conv1d_same(x, conv["kernel"], conv["bias"], cfg.stride)
        inv = jax.lax.rsqrt(bn["var"] + cfg.bn_eps)
        x = (x - bn["mean"]) * (inv * bn["scale"]) + bn["bias"]
        x = jnp.where(x >= 0, x, cfg.leaky_slope * x)
        # Valid-length chain: torch conv1d(k odd, p=(k-1)//2) maps T -> ceil(T/s).
        n = -(-n // cfg.stride)
        mask = jnp.arange(x.shape[1])[None, :] < n[:, None]
        x = x * mask[:, :, None].astype(x.dtype)
    feats = jnp.sum(x, axis=1) / jnp.maximum(n, 1)[:, None].astype(x.dtype)
    acoustic = feats @ params["acoustic"]["kernel"] + params["acoustic"]["bias"]
    content = feats @ params["content"]["kernel"] + params["content"]["bias"]
    return (
        feats.astype(jnp.float32),
        acoustic.astype(jnp.float32),
        content.astype(jnp.float32),
    )


def l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(v, dim=1) semantics: v / max(||v||_2, eps)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    return v / jnp.maximum(norm, eps)


def init_cdpam_params(key, cfg: CdpamConfig = DEFAULT_CONFIG, dtype=jnp.float32):
    """Random parameters (torch-style uniform fan-in init) for pipeline tests."""
    keys = iter(jax.random.split(key, 2 * len(cfg.channels) + 4))

    convs, norms = [], []
    cin = 1
    for cout in cfg.channels:
        s = 1.0 / math.sqrt(cfg.kernel_size * cin)
        convs.append(
            {
                "kernel": jax.random.uniform(
                    next(keys), (cfg.kernel_size, cin, cout), dtype, -s, s
                ),
                "bias": jnp.zeros((cout,), dtype),
            }
        )
        norms.append(
            {
                "scale": jnp.ones((cout,), dtype),
                "bias": jnp.zeros((cout,), dtype),
                "mean": jnp.zeros((cout,), dtype),
                # Spread running variances so random-weight tests catch a
                # forward that ignores or misapplies them.
                "var": 1.0
                + 0.1 * jax.random.uniform(next(keys), (cout,), dtype),
            }
        )
        cin = cout

    def head():
        s = 1.0 / math.sqrt(cin)
        return {
            "kernel": jax.random.uniform(next(keys), (cin, cfg.emb_dim), dtype, -s, s),
            "bias": jax.random.uniform(next(keys), (cfg.emb_dim,), dtype, -s, s),
        }

    return {"convs": convs, "norms": norms, "acoustic": head(), "content": head()}
