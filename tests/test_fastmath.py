"""ops/fastmath.sin_cw accuracy pins (the DAC snake default — see
scripts/snake_norm_probe.py for the 2.6x whole-model measurement)."""

import numpy as np

import jax.numpy as jnp

from fadtk_tpu.ops.fastmath import sin_cw


def test_sin_cw_matches_numpy_small_args():
    # snake's working range: alpha ~ O(1), activations O(10)
    z = np.linspace(-50.0, 50.0, 200001).astype(np.float32)
    got = np.asarray(sin_cw(jnp.asarray(z)))
    err = np.abs(got - np.sin(z.astype(np.float64)))
    assert err.max() < 5e-7, err.max()  # measured 2.1e-7 (~3 ulp) worst-case


def test_sin_cw_large_args_within_codyweite_range():
    # the two-part reduction holds to |z| ~ 1e4 (k < 2^12 keeps k*PI2_HI exact)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1e4, 1e4, 100000).astype(np.float32)
    got = np.asarray(sin_cw(jnp.asarray(z)))
    err = np.abs(got - np.sin(z.astype(np.float64)))
    assert err.max() < 5e-6, err.max()


def test_sin_cw_odd_and_zero():
    z = np.asarray([0.0, 1.0, -1.0, np.pi, -np.pi], np.float32)
    got = np.asarray(sin_cw(jnp.asarray(z)))
    assert got[0] == 0.0
    np.testing.assert_allclose(got[1], -got[2], rtol=0, atol=0)


def test_snake_exact_sin_escape(monkeypatch):
    """FADTK_TPU_EXACT_SIN=1 restores the XLA builtin inside _snake."""
    import jax

    from fadtk_tpu.models.dac_impl import _snake

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 64)), jnp.float32)
    alpha = jnp.asarray(np.abs(np.random.default_rng(2).standard_normal(4)) + 0.5)

    fast = np.asarray(jax.jit(_snake)(x, alpha))
    monkeypatch.setenv("FADTK_TPU_EXACT_SIN", "1")
    exact = np.asarray(jax.jit(_snake)(x, alpha))
    np.testing.assert_allclose(fast, exact, atol=5e-7)
    # and the exact path really is sin: closed form check
    a = np.asarray(alpha)[None, :, None]
    want = np.asarray(x) + (1.0 / (a + 1e-9)) * np.sin(a * np.asarray(x)) ** 2
    np.testing.assert_allclose(exact, want, atol=1e-6)
