"""Whisper tensor-parallel step == single-device forward on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from fadtk_tpu.models.whisper_impl import (
    WhisperConfig,
    init_whisper_params,
    whisper_forward,
)
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.parallel.whisper_tp import make_sharded_whisper_step

TINY = WhisperConfig(
    d_model=32, encoder_layers=2, encoder_heads=4, decoder_layers=2,
    decoder_heads=4, encoder_ffn=64, decoder_ffn=64, num_mel_bins=16,
    max_source_positions=64, max_target_positions=8, vocab_size=100,
    decoder_start_token_id=7,
)


def test_whisper_tp_matches_single_device():
    params = init_whisper_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 16, 128)).astype(np.float32) * 0.3

    ref = np.asarray(whisper_forward(TINY, params, jnp.asarray(feats)))

    mesh = make_mesh(8, tp=2)  # dp=4, tp=2
    step = make_sharded_whisper_step(TINY, params, mesh)
    got = np.asarray(step(params, jnp.asarray(feats)))

    assert got.shape == ref.shape == (4, 2, TINY.d_model)
    np.testing.assert_allclose(got, ref, atol=2e-5)
