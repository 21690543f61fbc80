"""Frechet distance tests: eigh method vs the reference's scipy dual
computation, Newton-Schulz device path tolerance, and closed-form sanity."""

import numpy as np
import pytest

from fadtk_tpu.metric.frechet import (
    calc_frechet_distance,
    frechet_distance,
    trace_sqrtm_product_ns,
)


def _random_gaussian(rng, d, scale=1.0):
    a = rng.standard_normal((d, 2 * d))
    cov = (a @ a.T) / (2 * d) * scale
    mu = rng.standard_normal(d)
    return mu, cov


@pytest.mark.parametrize("d", [8, 64, 128])
def test_eigh_matches_reference_method(d):
    rng = np.random.default_rng(d)
    mu1, cov1 = _random_gaussian(rng, d)
    mu2, cov2 = _random_gaussian(rng, d, scale=2.0)

    ref = frechet_distance(mu1, cov1, mu2, cov2, method="reference")
    ours = frechet_distance(mu1, cov1, mu2, cov2, method="eigh")
    assert abs(ref - ours) < 1e-8 * max(1.0, abs(ref))


def test_identical_gaussians_give_zero():
    rng = np.random.default_rng(0)
    mu, cov = _random_gaussian(rng, 32)
    assert abs(calc_frechet_distance(mu, cov, mu, cov)) < 1e-9


def test_mean_shift_only():
    """With equal covariances the distance is exactly ||mu1 - mu2||^2."""
    rng = np.random.default_rng(1)
    mu1, cov = _random_gaussian(rng, 16)
    mu2 = mu1 + 0.5
    d = calc_frechet_distance(mu1, cov, mu2, cov)
    assert abs(d - 0.25 * 16) < 1e-8


def test_diagonal_closed_form():
    """For diagonal covariances: d = ||dmu||^2 + sum (sqrt(a) - sqrt(b))^2."""
    rng = np.random.default_rng(2)
    a = rng.random(24) + 0.1
    b = rng.random(24) + 0.1
    mu1, mu2 = rng.standard_normal(24), rng.standard_normal(24)
    expected = np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(a) - np.sqrt(b)) ** 2)
    got = calc_frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    assert abs(got - expected) < 1e-8


def test_float16_eval_mu_parity():
    """Eval means arrive as float16 (reference fadtk/fad.py:48); both methods
    must consume them identically."""
    rng = np.random.default_rng(3)
    mu1, cov1 = _random_gaussian(rng, 32)
    mu2, cov2 = _random_gaussian(rng, 32)
    mu2 = mu2.astype(np.float16)
    ref = frechet_distance(mu1, cov1, mu2, cov2, method="reference")
    ours = frechet_distance(mu1, cov1, mu2, cov2, method="eigh")
    assert abs(ref - ours) < 1e-8 * max(1.0, abs(ref))


@pytest.mark.parametrize("d", [32, 128])
def test_newton_schulz_trace(d):
    import jax.numpy as jnp

    rng = np.random.default_rng(d + 1)
    _, cov1 = _random_gaussian(rng, d)
    _, cov2 = _random_gaussian(rng, d)

    from scipy import linalg

    exact = np.sum(np.sqrt(np.clip(np.real(linalg.eigvals(cov1 @ cov2)), 0, None)))
    ns = float(
        trace_sqrtm_product_ns(jnp.asarray(cov1, jnp.float32), jnp.asarray(cov2, jnp.float32))
    )
    # float32 floors the achievable accuracy around 1e-3 relative for
    # ill-conditioned covariances; the NS path is the *throughput* mode (FAD-inf
    # sweeps), while score parity uses the float64 eigh path.
    assert abs(ns - exact) / exact < 5e-3


def test_frechet_on_sample_covariances_of_f16_frames():
    """End-to-end shape of the real use: float16 frames -> float64 covs."""
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((400, 64)) + 1.0).astype(np.float16)
    y = (rng.standard_normal((300, 64)) * 1.5).astype(np.float16)
    mu1, cov1 = np.mean(x, axis=0), np.cov(x, rowvar=False)
    mu2, cov2 = np.mean(y, axis=0), np.cov(y, rowvar=False)
    ref = frechet_distance(mu1, cov1, mu2, cov2, method="reference")
    ours = frechet_distance(mu1, cov1, mu2, cov2, method="eigh")
    assert abs(ref - ours) < 1e-6 * max(1.0, abs(ref))


def test_frechet_baseline_factor_matches_full():
    from fadtk_tpu.metric.frechet import FrechetBaseline

    rng = np.random.default_rng(9)
    mu1, cov1 = _random_gaussian(rng, 48)
    fb = FrechetBaseline(mu1, cov1)
    for i in range(3):
        mu2, cov2 = _random_gaussian(rng, 48, scale=1.0 + i)
        full = frechet_distance(mu1, cov1, mu2, cov2, method="eigh")
        assert abs(fb.distance(mu2, cov2) - full) < 1e-8 * max(1.0, abs(full))
