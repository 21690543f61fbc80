"""Fused log-mel Pallas kernel: interpret-mode equality vs the plain XLA
formulation for every log variant and odd shapes."""

import numpy as np
import pytest

import jax.numpy as jnp

from fadtk_tpu.dsp.pallas_mel import fused_log_mel


@pytest.mark.parametrize(
    "log_mode,log_offset",
    [("ln_offset", 0.01), ("log10_clamp", 0.0), ("db_clamp", 0.0)],
)
@pytest.mark.parametrize("n,w,f,m", [(100, 400, 257, 64), (300, 1024, 513, 80)])
def test_fused_log_mel_matches_xla(log_mode, log_offset, n, w, f, m):
    rng = np.random.default_rng(hash((log_mode, n)) % 2**31)
    frames = rng.standard_normal((n, w)).astype(np.float32) * 0.3
    dre = rng.standard_normal((w, f)).astype(np.float32) * 0.05
    dim = rng.standard_normal((w, f)).astype(np.float32) * 0.05
    mel = np.abs(rng.standard_normal((f, m))).astype(np.float32) * 0.01

    got = np.asarray(
        fused_log_mel(
            jnp.asarray(frames), jnp.asarray(dre), jnp.asarray(dim), jnp.asarray(mel),
            log_mode=log_mode, log_offset=log_offset, interpret=True,
        )
    )

    re = frames @ dre
    im = frames @ dim
    power = re * re + im * im
    mel_spec = power @ mel
    if log_mode == "ln_offset":
        want = np.log(mel_spec + log_offset)
    elif log_mode == "log10_clamp":
        want = np.log10(np.maximum(mel_spec, 1e-10))
    else:
        want = 10.0 * np.log10(np.maximum(mel_spec, 1e-10))

    assert got.shape == want.shape == (n, m)
    np.testing.assert_allclose(got, want, atol=2e-4)
