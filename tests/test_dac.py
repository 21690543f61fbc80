"""DAC tests: JAX encoder vs a torch mirror of descript-audio-codec's encoder
(same module tree as the real checkpoint), loudness meter anchors, model-class
windowing."""

import math
import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

torch = pytest.importorskip("torch")
from torch import nn

import jax.numpy as jnp

from fadtk_tpu.models.dac_impl import DACEncoderConfig, dac_encode
from fadtk_tpu.weights.dac import convert_dac_encoder


# Torch mirror of dac/model/dac.py (module tree == the published checkpoints).
def WNConv1d(*args, **kwargs):
    return nn.utils.parametrizations.weight_norm(nn.Conv1d(*args, **kwargs))


class Snake1d(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        y = self.block(x)
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class EncoderBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            ResidualUnit(dim // 2, 1),
            ResidualUnit(dim // 2, 3),
            ResidualUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class Encoder(nn.Module):
    def __init__(self, d_model, strides, d_latent):
        super().__init__()
        block = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for s in strides:
            d_model *= 2
            block.append(EncoderBlock(d_model, s))
        block += [Snake1d(d_model), WNConv1d(d_model, d_latent, kernel_size=3, padding=1)]
        self.block = nn.Sequential(*block)

    def forward(self, x):
        return self.block(x)


def test_dac_encoder_matches_torch_mirror():
    cfg = DACEncoderConfig(d_model=8, strides=(2, 4), latent_dim=32)
    torch.manual_seed(0)
    enc = Encoder(8, list(cfg.strides), 32).eval()
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 1, 1600)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(audio)).numpy()  # (B, latent, T')

    params = convert_dac_encoder(sd, cfg)
    ours = np.asarray(dac_encode(cfg, params, jnp.asarray(audio)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=2e-4)


def test_loudness_sine_anchor():
    """BS.1770: a 997 Hz full-scale sine reads -3.01 LKFS."""
    from fadtk_tpu.dsp.loudness import integrated_loudness

    sr = 48000
    t = np.arange(sr * 3) / sr
    x = np.sin(2 * np.pi * 997.0 * t)
    assert abs(integrated_loudness(x, sr) - (-3.01)) < 0.1

    # -20 dBFS version is exactly 20 dB quieter.
    l2 = integrated_loudness(0.1 * x, sr)
    assert abs(l2 - (-23.01)) < 0.15


def test_normalize_loudness():
    from fadtk_tpu.dsp.loudness import integrated_loudness, normalize_loudness

    sr = 44100
    rng = np.random.default_rng(1)
    x = rng.standard_normal(sr * 2) * 0.05
    y = normalize_loudness(x, sr, -16.0)
    assert abs(integrated_loudness(y, sr) - (-16.0)) < 0.2


def test_dac_model_windows():
    from fadtk_tpu.models.dac import DACModel

    m = DACModel()
    m.ensure_loaded()
    # 7 s -> padded to 10 s -> windows at 0/2.5/5 s -> 3 windows x 430 frames.
    audio = np.random.default_rng(2).standard_normal(7 * 44100) * 0.1
    emb = m.get_embedding(audio)
    assert emb.shape == (3 * 430, 1024)
    assert emb.dtype == np.float16
