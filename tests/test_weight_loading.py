"""Converted-checkpoint loading: the stored __config__ metadata must override
defaults, keep frozen configs hashable (jit-cache keys), and produce working
embeddings end-to-end."""

import json

import jax
import numpy as np
import pytest


def test_speech_model_loads_converted_npz_with_config(tmp_path, monkeypatch):
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import init_speech_encoder_params
    from fadtk_tpu.weights.store import save_params

    # A deliberately non-default tiny architecture, as conversion would record.
    meta = dict(
        conv_dim=[16, 16], conv_kernel=[10, 3], conv_stride=[5, 2],
        conv_bias=False, feat_extract_norm="group", feat_proj_layer_norm=True,
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        do_stable_layer_norm=False, layer_norm_eps=1e-5,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_normalize=False,
    )
    cfg = SpeechEncoderConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in meta.items()}
    )
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    params["__config__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)

    ckpt_dir = tmp_path / "ckpts"
    monkeypatch.setenv("FADTK_TPU_CHECKPOINTS", str(ckpt_dir))
    monkeypatch.delenv("FADTK_TPU_RANDOM_WEIGHTS", raising=False)
    save_params(params, ckpt_dir / "facebook__wav2vec2-base-960h.npz")

    from fadtk_tpu.models.wav2vec2 import W2V2Model

    m = W2V2Model("base", layer=2)
    m.ensure_loaded()

    # Stored config overrode the real-base defaults...
    assert m.cfg.hidden_size == 32
    assert m.cfg.conv_dim == (16, 16)  # tuple again, hashable
    hash(m.cfg)  # would raise for list fields

    # ...and the model embeds with the restored weights.
    audio = np.random.default_rng(0).standard_normal(8000) * 0.1
    emb = m.get_embedding(audio)
    assert emb.shape == (m.cfg.num_output_frames(8000), 32)


def test_missing_weights_error_message(tmp_path, monkeypatch):
    from fadtk_tpu.models.wav2vec2 import W2V2Model
    from fadtk_tpu.weights.store import MissingWeightsError

    monkeypatch.setenv("FADTK_TPU_CHECKPOINTS", str(tmp_path / "empty"))
    monkeypatch.delenv("FADTK_TPU_RANDOM_WEIGHTS", raising=False)
    with pytest.raises(MissingWeightsError, match="fadtk-convert"):
        W2V2Model("base", layer=12).ensure_loaded()
