"""Encodec tests: JAX SEANet encoder vs HF transformers EncodecModel with
identical random weights (24k causal/weight-norm and 48k asymmetric/group-norm),
plus the model-class segmentation behavior."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fadtk_tpu.models.encodec_impl import (
    CONFIG_24K,
    CONFIG_48K,
    encodec_encode,
)
from fadtk_tpu.weights.encodec import convert_encodec_encoder


def _hf_encodec(cfg, seed):
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.encodec.modeling_encodec import EncodecEncoder

    torch.manual_seed(seed)
    hf_cfg = EncodecConfig(
        audio_channels=cfg.audio_channels,
        num_filters=cfg.num_filters,
        upsampling_ratios=list(cfg.upsampling_ratios),
        num_residual_layers=cfg.num_residual_layers,
        dilation_growth_rate=cfg.dilation_growth_rate,
        kernel_size=cfg.kernel_size,
        last_kernel_size=cfg.last_kernel_size,
        residual_kernel_size=cfg.residual_kernel_size,
        compress=cfg.compress,
        hidden_size=cfg.hidden_size,
        num_lstm_layers=cfg.num_lstm_layers,
        use_causal_conv=cfg.use_causal_conv,
        norm_type=cfg.norm_type,
        pad_mode=cfg.pad_mode,
        use_conv_shortcut=cfg.use_conv_shortcut,
    )
    enc = EncodecEncoder(hf_cfg).eval()
    # Prefix keys like the full model so the converter sees encoder.layers.*
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    return enc, sd


@pytest.mark.parametrize("variant", ["24k", "48k"])
def test_encoder_matches_hf(variant):
    cfg = CONFIG_24K if variant == "24k" else CONFIG_48K
    enc, sd = _hf_encodec(cfg, seed=0)

    rng = np.random.default_rng(0)
    t = 7456  # deliberately not a multiple of the 320x hop
    audio = (rng.standard_normal((2, cfg.audio_channels, t)) * 0.3).astype(np.float32)

    with torch.no_grad():
        ref = enc(torch.from_numpy(audio)).numpy()  # (B, 128, T')

    params = convert_encodec_encoder(sd, cfg)
    ours = np.asarray(encodec_encode(cfg, params, jnp.asarray(audio)))  # (B, T', 128)

    assert ours.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=3e-4)


def test_encoder_matches_hf_original_package_key_style():
    """The original encodec package names layers encoder.model.{i}; the
    converter must accept that tree too."""
    cfg = CONFIG_24K
    enc, sd = _hf_encodec(cfg, seed=1)
    sd2 = {k.replace("encoder.layers.", "encoder.model."): v for k, v in sd.items()}

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((1, 1, 3200)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(audio)).numpy()
    params = convert_encodec_encoder(sd2, cfg)
    ours = np.asarray(encodec_encode(cfg, params, jnp.asarray(audio)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=3e-4)


def test_model_class_24k():
    from fadtk_tpu.models.encodec import EncodecEmbModel

    m = EncodecEmbModel("24k")
    m.ensure_loaded()
    audio = np.random.default_rng(2).standard_normal(24000).astype(np.float32) * 0.2
    emb = m.get_embedding(audio[None, :])
    # 24k hop is 320 -> 75 frames per second, causal padding ceils.
    assert emb.shape == (75, 128)
    assert emb.dtype == np.float16


def test_model_class_48k_segments():
    from fadtk_tpu.models.encodec import EncodecEmbModel

    m = EncodecEmbModel("48k")
    m.ensure_loaded()
    # 2.5 s stereo -> two full 1 s segments + one 0.5 s tail.
    audio = np.random.default_rng(3).standard_normal((2, 120000)).astype(np.float32) * 0.2
    emb = m.get_embedding(audio)
    # 48k hop 320 -> 150 frames per full segment; tail: 24000/320 = 75.
    assert emb.shape == (150 + 150 + 75, 128)


def test_load_wav_channel_conversion_and_truncation(tmp_path):
    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    from fadtk_tpu.models.encodec import EncodecEmbModel

    m = EncodecEmbModel("48k")
    x = np.random.default_rng(4).standard_normal(48000) * 0.1
    f = tmp_path / "a.wav"
    write_wav_int16(f, float_to_int16(x), 48000)
    wav = m.load_wav(f)
    assert wav.shape == (2, 48000)  # mono duplicated to stereo
    np.testing.assert_array_equal(wav[0], wav[1])


def test_embed_batch_matches_individual():
    from fadtk_tpu.models.encodec import EncodecEmbModel

    m = EncodecEmbModel("24k")
    m.ensure_loaded()
    rng = np.random.default_rng(5)
    clips = [
        (rng.standard_normal(n) * 0.2).astype(np.float64)[None, :]
        for n in (24000, 12000, 24000)
    ]
    batched = m.embed_batch(list(clips))
    for clip, got in zip(clips, batched):
        want = m.get_embedding(clip)
        assert got.shape == want.shape and got.dtype == want.dtype == np.float16
        # Batched XLA executables may differ from B=1 by float32 ulps before
        # the float16 storage cast.
        np.testing.assert_allclose(
            got.astype(np.float32), want.astype(np.float32), atol=2e-3
        )
