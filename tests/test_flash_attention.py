"""Fused flash-attention kernel == XLA attention core (interpret mode on the
CPU test mesh; the compiled kernel is exercised on real TPU by bench.py).

The kernel replaces the XLA path in the speech encoders and the Whisper
encoder (fadtk_tpu/ops/flash_attention.py); WavLM's dense gated position bias
keeps the XLA path. Tolerances are float32-roundoff: the online softmax
reorders the reduction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fadtk_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, nv):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhtd,bhsd->bhts", q * scale, k).astype(jnp.float32)
    mask = jnp.arange(q.shape[2])[None, :] < nv[:, None]
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@pytest.mark.parametrize(
    "b,h,t,d",
    [(2, 3, 499, 64), (1, 2, 130, 32), (2, 1, 512, 64), (1, 4, 1500, 64)],
)
def test_matches_xla_attention(b, h, t, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray(rng.integers(1, t + 1, size=b), jnp.int32)

    out = flash_attention(q, k, v, nv, interpret=True)
    ref = _ref(q, k, v, nv)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=3e-6
        )
    # Padded rows must stay finite (they feed later layers' K/V, which the
    # key mask then excludes — NaNs would propagate through masked softmax).
    assert bool(jnp.isfinite(out).all())


def test_no_mask_means_all_valid():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    out = flash_attention(q, k, v, None, interpret=True)
    ref = _ref(q, k, v, jnp.asarray([200], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_padded_batch_matches_unpadded():
    """The mask-exactness invariant: a clip embedded inside a padded batch
    equals the same clip at its exact length (valid rows only)."""
    rng = np.random.default_rng(2)
    t_full, t_short = 384, 250
    q = jnp.asarray(rng.standard_normal((1, 2, t_full, 64)), jnp.float32)
    k, v = (
        jnp.asarray(rng.standard_normal((1, 2, t_full, 64)), jnp.float32)
        for _ in range(2)
    )

    padded = flash_attention(q, k, v, jnp.asarray([t_short]), interpret=True)
    alone = flash_attention(
        q[:, :, :t_short], k[:, :, :t_short], v[:, :, :t_short],
        jnp.asarray([t_short]), interpret=True,
    )
    # Same block geometry is not guaranteed (different padding), so f32
    # roundoff tolerance rather than bit equality.
    np.testing.assert_allclose(
        np.asarray(padded[:, :, :t_short]), np.asarray(alone), atol=3e-6
    )


def test_bfloat16_path():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    nv = jnp.asarray([256, 100], jnp.int32)
    out = flash_attention(q, k, v, nv, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), nv)
    for bi in range(2):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n], np.float32),
            np.asarray(ref[bi, :, :n]),
            atol=0.03,  # bf16 p@v accumulation
        )
