"""Fused SEANet resnet kernel (ops/fused_resnet.py) vs the XLA chain.

The kernel must reproduce models/encodec_impl._resnet_block exactly (up to
f32 tap-summation order) for the 24k config class: causal reflect padding,
k=3 dilation-1 conv, k=1 conv, k=1 shortcut. Cases cover the reflect left
boundary (t == 0), ragged T (not a lane multiple), multi-tile T, and both
compute dtypes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fadtk_tpu.models.encodec_impl import CONFIG_24K, _resnet_block
from fadtk_tpu.ops.fused_resnet import fused_resnet_causal


def _params(c, ch, rng):
    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    return {
        "block_conv1": {"kernel": t(ch, c, 3), "bias": t(ch)},
        "block_conv2": {"kernel": t(c, ch, 1), "bias": t(c)},
        "shortcut": {"kernel": t(c, c, 1), "bias": t(c)},
    }


@pytest.mark.parametrize("t_len", [517, 130, 3])
def test_fused_matches_xla_chain_f32(monkeypatch, t_len):
    rng = np.random.default_rng(0)
    c, ch = 32, 16
    p = _params(c, ch, rng)
    x = jnp.asarray(rng.standard_normal((2, c, t_len)) * 0.5, jnp.float32)

    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "0")
    ref = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1)))

    got = np.asarray(
        fused_resnet_causal(
            x,
            p["block_conv1"]["kernel"],
            p["block_conv1"]["bias"],
            p["block_conv2"]["kernel"][:, :, 0],
            p["block_conv2"]["bias"],
            p["shortcut"]["kernel"][:, :, 0],
            p["shortcut"]["bias"],
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fused_multi_tile_boundary(monkeypatch):
    """T spanning several tiles: halo columns must carry across tiles.

    _tile_len(c) is ~12k lanes at C=32 — too big for a quick CPU test — so
    tile behavior is exercised by shrinking the tile length via the module
    constant is not exposed; instead use a large C so the tile shrinks:
    C=256 -> Tt=1536, T=4000 spans 3 tiles including a ragged tail.
    """
    rng = np.random.default_rng(1)
    c, ch = 256, 128
    p = _params(c, ch, rng)
    x = jnp.asarray(rng.standard_normal((1, c, 4000)) * 0.5, jnp.float32)

    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "0")
    ref = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1)))
    got = np.asarray(
        fused_resnet_causal(
            x,
            p["block_conv1"]["kernel"],
            p["block_conv1"]["bias"],
            p["block_conv2"]["kernel"][:, :, 0],
            p["block_conv2"]["bias"],
            p["shortcut"]["kernel"][:, :, 0],
            p["shortcut"]["bias"],
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_resnet_block_routes_to_kernel(monkeypatch):
    """With the env force-on, _resnet_block output equals the XLA chain
    (interpret kernel on CPU), proving the guard wiring and argument
    plumbing."""
    rng = np.random.default_rng(2)
    c, ch = 32, 16
    p = _params(c, ch, rng)
    x = jnp.asarray(rng.standard_normal((2, c, 300)) * 0.5, jnp.float32)

    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "0")
    ref = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1)))
    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "1")
    got = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_bf16_path(monkeypatch):
    rng = np.random.default_rng(3)
    c, ch = 32, 16
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16), _params(c, ch, rng)
    )
    x = jnp.asarray(rng.standard_normal((2, c, 260)) * 0.5, jnp.bfloat16)

    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "0")
    ref = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1))).astype(np.float32)
    monkeypatch.setenv("FADTK_TPU_FUSED_RESNET", "1")
    got = np.asarray(_resnet_block(CONFIG_24K, p, x, (1, 1))).astype(np.float32)
    # bf16 rounding differs through the two op orders; 8e-3 is bf16 eps class
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)
