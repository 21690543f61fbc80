"""Resampler tests: polyphase/conv mechanics vs a brute-force evaluation of the
same Kaiser-sinc math, plus signal-level (tone fidelity / anti-aliasing / length)
properties that pin down the filter design itself."""

import numpy as np
import pytest

from fadtk_tpu.dsp.resample import kaiser_sinc_kernel, resample_kaiser


def _brute_force(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Direct O(N*K) evaluation: y[i*new + p] = sum_k x[i*orig + k - width] k[p,k]."""
    kernels, width, orig, new = kaiser_sinc_kernel(sr_in, sr_out)
    length = x.shape[0]
    xp = np.pad(x.astype(np.float64), (width, width + orig))
    n_blocks = (xp.shape[0] - kernels.shape[1]) // orig + 1
    out = np.zeros((n_blocks, new))
    for i in range(n_blocks):
        window = xp[i * orig : i * orig + kernels.shape[1]]
        out[i] = kernels.astype(np.float64) @ window
    y = out.reshape(-1)
    target = int(np.ceil(new * length / orig))
    return y[:target]


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(44100, 16000), (48000, 24000), (24000, 48000), (22050, 16000), (44100, 22050)],
)
def test_matches_brute_force(sr_in, sr_out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sr_in // 4).astype(np.float32)
    fast = resample_kaiser(x, sr_in, sr_out)
    slow = _brute_force(x, sr_in, sr_out)
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, atol=2e-5)


def test_output_length_formula():
    for sr_in, sr_out, n in [(44100, 16000, 44100), (48000, 24000, 12345), (16000, 24000, 999)]:
        y = resample_kaiser(np.zeros(n, np.float32), sr_in, sr_out)
        assert y.shape[0] == int(np.ceil(sr_out * n / sr_in))


def test_identity_when_rates_equal():
    x = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample_kaiser(x, 16000, 16000), x)


def test_tone_preserved_in_passband():
    """A 1 kHz tone through 44.1k -> 16k must come out at 1 kHz, ~unit gain."""
    sr_in, sr_out, f = 44100, 16000, 1000.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample_kaiser(x, sr_in, sr_out)

    t2 = np.arange(len(y)) / sr_out
    expected = np.sin(2 * np.pi * f * t2)
    # Ignore filter-length edge transients.
    m = slice(2000, len(y) - 2000)
    err = y[m] - expected[m]
    snr_db = 10 * np.log10(np.mean(expected[m] ** 2) / np.mean(err**2))
    assert snr_db > 60, f"passband SNR too low: {snr_db:.1f} dB"


def test_antialiasing():
    """A 10 kHz tone is above the 16 kHz Nyquist: it must be attenuated away."""
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 10000.0 * t).astype(np.float32)
    y = resample_kaiser(x, sr_in, sr_out)
    rms = np.sqrt(np.mean(y[1000:-1000] ** 2))
    assert rms < 1e-3, f"aliasing leak: rms={rms}"


def test_kernel_constants_and_shape():
    kernels, width, orig, new = kaiser_sinc_kernel(44100, 16000)
    # gcd(44100, 16000) = 100 -> 441 / 160
    assert (orig, new) == (441, 160)
    assert width == int(np.ceil(64 * orig / (160 * 0.9475937167399596)))
    assert kernels.shape == (new, 2 * width + orig)
    # DC gain of each phase filter must be ~1 (sinc interpolation preserves DC).
    dc = kernels.sum(axis=1)
    np.testing.assert_allclose(dc, 1.0, atol=5e-4)


def test_host_matches_device_path():
    """The convert path's host GEMM and the pipeline's device conv are the
    same polyphase math; they must agree to float32 noise."""
    import jax.numpy as jnp

    from fadtk_tpu.dsp.resample import resample_batch

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12345)).astype(np.float32)
    host = resample_kaiser(x, 44100, 16000)
    dev = np.asarray(resample_batch(jnp.asarray(x), 44100, 16000))
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, atol=2e-5)
