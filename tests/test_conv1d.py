"""Framed-GEMM conv1d lowering (ops/conv1d.py) == XLA conv_general_dilated.

Same dot products, different accumulation order; equivalence pinned here at
f32 tolerance over strides/dilations/channel widths covering every call-site
shape class in the conv families."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax.numpy as jnp

from fadtk_tpu.ops.conv1d import conv1d_ncl, conv1d_nlc


@pytest.mark.parametrize(
    "cin,cout,k,stride,dil,t",
    [
        (1, 32, 7, 1, 1, 1201),     # encodec/dac conv_in
        (16, 16, 3, 1, 1, 640),     # encodec residual
        (32, 64, 4, 2, 1, 800),     # encodec down s2
        (64, 128, 8, 4, 1, 1024),   # encodec down s4
        (128, 256, 10, 5, 1, 1000), # encodec down s5
        (32, 32, 7, 1, 9, 900),     # dac dilated residual
        (512, 128, 7, 1, 1, 750),   # encodec conv_out
    ],
)
def test_ncl_matches_xla_conv(cin, cout, k, stride, dil, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, cin, t)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cout, cin, k)), jnp.float32) * 0.1
    a = conv1d_ncl(x, w, stride=stride, dilation=dil, lowering="conv")
    b = conv1d_ncl(x, w, stride=stride, dilation=dil, lowering="gemm")
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,stride,t", [(1, 32, 15, 2, 22050), (64, 64, 15, 2, 700)])
def test_nlc_matches_xla_conv(cin, cout, k, stride, t):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32) * 0.1
    a = conv1d_nlc(x, w, stride=stride, lowering="conv")
    b = conv1d_nlc(x, w, stride=stride, lowering="gemm")
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def test_env_escape_hatch(monkeypatch):
    """conv (the XLA builtin) is the default — the round-3 whole-model A/B
    showed it beats both GEMM framings in-model; gemm is the rescue for
    pathological remote conv compiles."""
    from fadtk_tpu.ops import conv1d

    monkeypatch.setenv("FADTK_TPU_CONV_LOWERING", "gemm")
    conv1d._lowering_default.cache_clear()
    assert conv1d._lowering_default() == "gemm"
    monkeypatch.setenv("FADTK_TPU_CONV_LOWERING", "nonsense")
    conv1d._lowering_default.cache_clear()
    assert conv1d._lowering_default() == "conv"
    monkeypatch.delenv("FADTK_TPU_CONV_LOWERING")
    conv1d._lowering_default.cache_clear()
    assert conv1d._lowering_default() == "conv"
