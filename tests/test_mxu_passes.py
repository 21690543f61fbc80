"""The padded MXU-pass counter behind the attention-family time ledgers
(scripts/mxu_passes.py): exact/padded flop accounting for dot_general, conv,
batched dots, grouped convs, and scan trip-count multiplication."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from mxu_passes import gemm_records, gemm_summary  # noqa: E402


def test_plain_matmul():
    f = lambda a, b: a @ b
    a, b = jnp.zeros((256, 64)), jnp.zeros((64, 512))
    (r,) = gemm_records(f, a, b)
    assert (r.batch, r.m, r.k, r.n) == (1, 256, 64, 512)
    assert r.exact_flops == 2 * 256 * 64 * 512
    # K=64 pads to one 128-tile: passes = 2*1*4 = 8
    assert r.padded_flops == 2 * 2 * 1 * 4 * 128**3


def test_batched_attention_dot():
    # (B,H,T,D)x(B,H,S,D) logits einsum: batch=B*H, M=T, K=D, N=S
    f = lambda q, k: jnp.einsum("bhtd,bhsd->bhts", q, k)
    q = jnp.zeros((4, 8, 500, 64))
    k = jnp.zeros((4, 8, 600, 64))
    (r,) = gemm_records(f, q, k)
    assert (r.batch, r.m, r.k, r.n) == (32, 500, 64, 600)
    assert r.padded_flops == 2 * 32 * 4 * 1 * 5 * 128**3


def test_conv_as_gemm():
    # NHC conv: M = B*T_out, K = k*C_in, N = C_out
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC")
        )

    x = jnp.zeros((16, 3000, 80))
    w = jnp.zeros((3, 80, 512))
    (r,) = gemm_records(f, x, w)
    assert (r.batch, r.m, r.k, r.n) == (1, 16 * 1500, 3 * 80, 512)


def test_grouped_conv_multiplies_passes():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=16,
        )

    x = jnp.zeros((2, 100, 768))
    w = jnp.zeros((5, 48, 768))  # 16 groups of 48 -> 48
    (r,) = gemm_records(f, x, w)
    # Valid padding: T_out = 100 - 5 + 1 = 96
    assert (r.batch, r.m, r.k, r.n) == (16, 2 * 96, 5 * 48, 48)


def test_scan_multiplies_by_trip_count():
    def layer(x, w):
        return x @ w

    def f(x, ws):
        y, _ = jax.lax.scan(lambda c, w: (layer(c, w), None), x, ws)
        return y

    x = jnp.zeros((64, 128))
    ws = jnp.zeros((12, 128, 128))
    recs = [r for r in gemm_records(f, x, ws) if r.op == "dot_general"]
    assert sum(r.exact_flops for r in recs) == 12 * 2 * 64 * 128 * 128


def test_whisper_base_closed_form():
    """The walker's exact flops on the real whisper-base bench graph match
    the closed-form GEMM count bench.py uses for whisper-large (same formula,
    base geometry) to within the small terms (decoder embed, mel interp)."""
    from fadtk_tpu.models.whisper_impl import (
        config_for_size,
        init_whisper_params,
        whisper_forward,
    )

    cfg = config_for_size("tiny")
    params = init_whisper_params(cfg, jax.random.PRNGKey(0))
    b = 2
    feats = jnp.zeros((b, 80, 3000))

    s = gemm_summary(lambda p, f: whisper_forward(cfg, p, f), params, feats)
    d, te, td = cfg.d_model, 1500, 2
    enc_layer = (4 * te * d * d + 2 * te * te * d + 2 * te * d * cfg.encoder_ffn) * 2
    dec_layer = (
        (4 * td * d * d) + (2 * td * d * d) + (2 * te * d * d)
        + (2 * td * d * cfg.decoder_ffn)
    ) * 2
    convs = (3000 * d * cfg.num_mel_bins * 3 + te * d * d * 3) * 2
    closed = b * (convs + cfg.encoder_layers * enc_layer + cfg.decoder_layers * dec_layer)
    np.testing.assert_allclose(s["exact_tflop"] * 1e12, closed, rtol=0.02)
    assert s["padded_tflop"] >= s["exact_tflop"]
