"""Whisper tests: slaney filterbank vs transformers, frontend vs the HF feature
extractor, and the full model vs HF WhisperModel with identical random weights
(including the 2-forced-token decoder quirk the reference relies on)."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fadtk_tpu.dsp.mel import mel_filterbank_slaney, whisper_log_mel
from fadtk_tpu.models.whisper_impl import WhisperConfig, whisper_forward
from fadtk_tpu.weights.whisper import convert_whisper

TINY = WhisperConfig(
    d_model=32, encoder_layers=2, encoder_heads=4, decoder_layers=2,
    decoder_heads=4, encoder_ffn=64, decoder_ffn=64, num_mel_bins=80,
    max_source_positions=1500, max_target_positions=448, vocab_size=1000,
    decoder_start_token_id=7,
)


def test_slaney_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney", mel_scale="slaney",
    )
    ours = mel_filterbank_slaney(80, 201, 16000, 0.0, 8000.0)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_frontend_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)

    ref = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    clip = np.zeros(480000, np.float32)
    clip[: len(audio)] = audio
    ours = np.asarray(whisper_log_mel(jnp.asarray(clip[None])))[0]

    assert ours.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_whisper_matches_hf_model():
    from transformers import WhisperConfig as HFConfig, WhisperModel as HFModel

    torch.manual_seed(0)
    hf = HFModel(
        HFConfig(
            d_model=TINY.d_model, encoder_layers=TINY.encoder_layers,
            encoder_attention_heads=TINY.encoder_heads,
            decoder_layers=TINY.decoder_layers,
            decoder_attention_heads=TINY.decoder_heads,
            encoder_ffn_dim=TINY.encoder_ffn, decoder_ffn_dim=TINY.decoder_ffn,
            num_mel_bins=80, max_source_positions=1500, max_target_positions=448,
            vocab_size=1000, decoder_start_token_id=7, pad_token_id=0,
            bos_token_id=0, eos_token_id=0,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        )
    ).eval()

    rng = np.random.default_rng(1)
    features = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5

    # Exactly the reference's invocation (fadtk/model_loader.py:662,669).
    decoder_input_ids = torch.tensor([[1, 1]]) * 7
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(features), decoder_input_ids=decoder_input_ids
        ).last_hidden_state.numpy()[0]

    params = convert_whisper(hf.state_dict(), TINY)
    ours = np.asarray(whisper_forward(TINY, params, jnp.asarray(features)))[0]

    assert ours.shape == ref.shape == (2, TINY.d_model)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_whisper_embed_path():
    from fadtk_tpu.models.whisper import WhisperModel

    m = WhisperModel("tiny")
    m.ensure_loaded()
    audio = np.random.default_rng(2).standard_normal(16000 * 5) * 0.2
    emb = m.get_embedding(audio)
    assert emb.shape == (2, 384)  # the 2-frame quirk
    assert emb.dtype == np.float16


def test_whisper_embed_batch_matches_individual():
    from fadtk_tpu.models.whisper import WhisperModel

    m = WhisperModel("tiny")
    m.ensure_loaded()
    rng = np.random.default_rng(11)
    clips = [rng.standard_normal(n) * 0.2 for n in (16000 * 3, 16000 * 7)]
    batched = m.embed_batch(list(clips))
    for clip, got in zip(clips, batched):
        want = m.get_embedding(clip)
        assert got.shape == want.shape == (2, 384)
        np.testing.assert_allclose(
            got.astype(np.float32), want.astype(np.float32), atol=2e-3
        )
