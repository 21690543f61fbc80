"""FADTK_TPU_SCAN_LAYERS=1: lax.scan over the homogeneous encoder layers ==
the unrolled loop (ARCHITECTURE.md 'Compile-time notes' — the scan variant
compiles ~1.7x faster for 24-layer models; numerics agree to reordered-f32
roundoff, which is why it is opt-in rather than the parity default)."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax
import jax.numpy as jnp

from fadtk_tpu.models.speech.config import SpeechEncoderConfig
from fadtk_tpu.models.speech.encoder import (
    init_speech_encoder_params,
    speech_encoder_forward,
)


def _run(cfg, params, audio, nv, taps, scan, monkeypatch):
    if scan:
        monkeypatch.setenv("FADTK_TPU_SCAN_LAYERS", "1")
    else:
        monkeypatch.delenv("FADTK_TPU_SCAN_LAYERS", raising=False)
    # No jit wrapper: the env flag is read at trace time, so cached
    # executables must not be reused across flag flips.
    return speech_encoder_forward(cfg, params, audio, nv, taps=taps)


@pytest.mark.parametrize("attention_type", ["standard", "wavlm"])
@pytest.mark.parametrize("taps_kind", ["all", "last", "middle"])
def test_scan_matches_unrolled(attention_type, taps_kind, monkeypatch):
    cfg = SpeechEncoderConfig(attention_type=attention_type, do_normalize=False)
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 16000)), jnp.float32) * 0.1
    nv = jnp.asarray([16000, 9000], jnp.int32)
    taps = {
        "all": None,
        "last": (cfg.num_layers,),
        "middle": (0, 5, cfg.num_layers),
    }[taps_kind]

    ref_states, ref_mask = _run(cfg, params, audio, nv, taps, False, monkeypatch)
    out_states, out_mask = _run(cfg, params, audio, nv, taps, True, monkeypatch)

    assert out_states.shape == ref_states.shape
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
    # Same math per layer; only XLA fusion boundaries differ (documented
    # ~1e-2 on TPU's 3-pass f32 matmuls — far tighter on the CPU test mesh).
    np.testing.assert_allclose(
        np.asarray(out_states), np.asarray(ref_states), atol=1e-4, rtol=1e-4
    )


def test_whisper_scan_matches_unrolled(monkeypatch):
    """Same flag drives the Whisper encoder+decoder stacks (whisper_impl
    _run_layers): scan == unrolled to f32-reorder roundoff."""
    from fadtk_tpu.models.whisper_impl import (
        WhisperConfig,
        init_whisper_params,
        whisper_forward,
    )

    cfg = WhisperConfig(
        d_model=64, encoder_layers=3, encoder_heads=4, decoder_layers=3,
        decoder_heads=4, encoder_ffn=128, decoder_ffn=128, num_mel_bins=16,
        max_source_positions=32, max_target_positions=8, vocab_size=64,
        decoder_start_token_id=7,
    )
    params = init_whisper_params(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 16, 64)), jnp.float32
    ) * 0.3

    monkeypatch.delenv("FADTK_TPU_SCAN_LAYERS", raising=False)
    ref = np.asarray(whisper_forward(cfg, params, feats))
    monkeypatch.setenv("FADTK_TPU_SCAN_LAYERS", "1")
    out = np.asarray(whisper_forward(cfg, params, feats))

    assert out.shape == ref.shape == (2, 2, cfg.d_model)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_scan_single_tap_avoids_stack(monkeypatch):
    """The single-tap scan path returns the carry (no (L, B, T, H) ys stack):
    shape contract matches the unrolled single-tap output."""
    cfg = SpeechEncoderConfig(do_normalize=False)
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(1))
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16000)), jnp.float32
    ) * 0.1
    monkeypatch.setenv("FADTK_TPU_SCAN_LAYERS", "1")
    states, mask = speech_encoder_forward(
        cfg, params, audio, jnp.asarray([16000], jnp.int32), taps=(cfg.num_layers,)
    )
    assert states.shape[0] == 1 and states.shape[-1] == cfg.hidden_size


def test_flag_flip_retraces(monkeypatch):
    """FADTK_TPU_SCAN_LAYERS is read at trace time, so the family-level jit
    caches key on it — flipping the flag mid-process must not silently reuse
    an executable traced under the other mode."""
    from fadtk_tpu.models.speech import family as fam

    cfg = SpeechEncoderConfig(do_normalize=False)
    monkeypatch.delenv("FADTK_TPU_SCAN_LAYERS", raising=False)
    f_off = fam._jitted_forward(cfg, (cfg.num_layers,), fam._scan_flag())
    monkeypatch.setenv("FADTK_TPU_SCAN_LAYERS", "1")
    f_on = fam._jitted_forward(cfg, (cfg.num_layers,), fam._scan_flag())
    assert f_off is not f_on

    from fadtk_tpu.models import whisper as wmod

    wcfg = wmod.config_for_size("tiny")
    monkeypatch.delenv("FADTK_TPU_SCAN_LAYERS", raising=False)
    w_off = wmod._jitted(wcfg, wmod._scan_flag())
    monkeypatch.setenv("FADTK_TPU_SCAN_LAYERS", "1")
    w_on = wmod._jitted(wcfg, wmod._scan_flag())
    assert w_off is not w_on
