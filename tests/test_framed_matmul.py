"""framed_basis_matmul (the hop-decomposed framed GEMM behind every mel
frontend) vs explicit numpy framing, including tail lengths where
n_blocks*hop < t (a negative jnp.pad width crashed these before the round-2
fix — e.g. t=481454, window=1024, hop=480)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fadtk_tpu.dsp.mel import framed_basis_matmul


def _reference(x, window, hop, basis):
    t = x.shape[-1]
    nf = 1 + (t - window) // hop
    frames = np.stack([x[:, i * hop : i * hop + window] for i in range(nf)], axis=1)
    return frames @ basis


@pytest.mark.parametrize(
    "t,window,hop",
    [
        (4000, 400, 160),      # whisper-style, aligned
        (481024, 1024, 480),   # CLAP production geometry
        (481454, 1024, 480),   # unused tail: n_blocks*hop < t (crash repro)
        (1025, 1024, 480),     # single frame + 1-sample tail
        (4161, 1024, 1024),    # hop == window (r == 0) with tail
        (777, 256, 100),       # ragged everything
    ],
)
def test_matches_explicit_framing(t, window, hop):
    rng = np.random.default_rng(t % 2**16)
    x = rng.standard_normal((2, t)).astype(np.float32)
    basis = rng.standard_normal((window, 8)).astype(np.float32) * 0.05

    got = np.asarray(framed_basis_matmul(jnp.asarray(x), window, hop, jnp.asarray(basis)))
    want = _reference(x, window, hop, basis)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
