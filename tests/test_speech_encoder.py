"""Differential tests: our JAX speech encoder vs HuggingFace torch models with
identical (random) weights — covers wav2vec2-style (group/post-norm),
large-style (layer/pre-norm), HuBERT, and WavLM gated-relative-bias attention,
plus the padding-exactness property the batched TPU pipeline relies on."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fadtk_tpu.models.speech.config import SpeechEncoderConfig
from fadtk_tpu.models.speech.encoder import speech_encoder_forward
from fadtk_tpu.weights.speech import convert_speech_encoder

SMALL = dict(
    conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 2),
    conv_stride=(5, 2, 2),
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    do_normalize=False,
)


def _hf_config_kwargs():
    return dict(
        conv_dim=list(SMALL["conv_dim"]),
        conv_kernel=list(SMALL["conv_kernel"]),
        conv_stride=list(SMALL["conv_stride"]),
        num_feat_extract_layers=3,
        hidden_size=SMALL["hidden_size"],
        num_hidden_layers=SMALL["num_layers"],
        num_attention_heads=SMALL["num_heads"],
        intermediate_size=SMALL["intermediate_size"],
        num_conv_pos_embeddings=SMALL["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=SMALL["num_conv_pos_embedding_groups"],
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        mask_time_prob=0.0,
        mask_feature_prob=0.0,
        hidden_act="gelu",
        feat_extract_activation="gelu",
    )


def _compare(hf_model, cfg, audio, atol=2e-4):
    hf_model.eval()
    with torch.no_grad():
        out = hf_model(torch.from_numpy(audio[None]), output_hidden_states=True)
    hf_states = np.stack([h.numpy()[0] for h in out.hidden_states])

    params = convert_speech_encoder(hf_model.state_dict(), cfg)
    states, mask = speech_encoder_forward(cfg, params, jnp.asarray(audio[None]))
    ours = np.asarray(states)[:, 0]

    assert hf_states.shape == ours.shape
    np.testing.assert_allclose(ours, hf_states, atol=atol)
    assert np.all(np.asarray(mask) == 1.0)


def test_w2v2_group_postnorm():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(
            **_hf_config_kwargs(),
            feat_extract_norm="group",
            do_stable_layer_norm=False,
            conv_bias=False,
        )
    )
    cfg = SpeechEncoderConfig(
        **SMALL, feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False
    )
    audio = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
    _compare(hf, cfg, audio)


def test_w2v2_layer_prenorm():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(1)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(
            **_hf_config_kwargs(),
            feat_extract_norm="layer",
            do_stable_layer_norm=True,
            conv_bias=True,
        )
    )
    cfg = SpeechEncoderConfig(
        **SMALL, feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True
    )
    audio = np.random.default_rng(1).standard_normal(4000).astype(np.float32)
    _compare(hf, cfg, audio)


def test_hubert():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(2)
    hf = HubertModel(
        HubertConfig(
            **_hf_config_kwargs(),
            feat_extract_norm="group",
            do_stable_layer_norm=False,
            conv_bias=False,
            feat_proj_layer_norm=True,
        )
    )
    cfg = SpeechEncoderConfig(
        **SMALL, feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False
    )
    audio = np.random.default_rng(2).standard_normal(4000).astype(np.float32)
    _compare(hf, cfg, audio)


def test_wavlm_gated_relative_bias():
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(3)
    hf = WavLMModel(
        WavLMConfig(
            **_hf_config_kwargs(),
            feat_extract_norm="group",
            do_stable_layer_norm=False,
            conv_bias=False,
            num_buckets=64,
            max_bucket_distance=160,
        )
    )
    cfg = SpeechEncoderConfig(
        **SMALL,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        attention_type="wavlm",
        num_buckets=64,
        max_bucket_distance=160,
    )
    audio = np.random.default_rng(3).standard_normal(4000).astype(np.float32)
    _compare(hf, cfg, audio)


@pytest.mark.parametrize("attention_type", ["standard", "wavlm"])
def test_padding_exactness(attention_type):
    """A clip padded to a longer bucket with num_valid set must produce exactly
    the same valid frames as the unpadded run — this is what makes batched
    static-shape inference score-neutral."""
    import jax

    from fadtk_tpu.models.speech.encoder import init_speech_encoder_params

    cfg = SpeechEncoderConfig(
        **SMALL,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        attention_type=attention_type,
        num_buckets=64,
        max_bucket_distance=160,
    )
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    audio = np.random.default_rng(4).standard_normal(3000).astype(np.float32)

    ref_states, _ = speech_encoder_forward(cfg, params, jnp.asarray(audio[None]))
    n_ref = ref_states.shape[2]

    padded = np.zeros(4096, np.float32)
    padded[:3000] = audio
    states, mask = speech_encoder_forward(
        cfg, params, jnp.asarray(padded[None]), jnp.asarray([3000], jnp.int32)
    )
    n_valid = int(np.asarray(mask).sum())
    assert n_valid == n_ref
    np.testing.assert_allclose(
        np.asarray(states)[:, :, :n_valid], np.asarray(ref_states), atol=1e-5
    )


@pytest.mark.parametrize("attention_type", ["standard", "wavlm"])
def test_padding_exactness_bf16_flash(attention_type, monkeypatch):
    """Same mask-exactness property through the bf16 fast mode with the flash
    kernel forced on (interpret on CPU — same kernel code as TPU): the kernel
    skips kv/query blocks beyond n_valid and flushes padded rows as zeros,
    which must not perturb the valid frames.

    Geometry exercises the skip for real: 16384 padded samples -> T=818
    frames -> two 512-blocks per axis, with n_valid=149 frames so block 1 is
    entirely beyond n_valid on both the query and kv axes (skipped compute,
    clamped DMA, zero-flushed rows) through every encoder layer."""
    import jax

    from fadtk_tpu.models.precision import cast_params_bf16
    from fadtk_tpu.models.speech.encoder import init_speech_encoder_params
    from fadtk_tpu.ops.flash_attention import _pick_block

    monkeypatch.setenv("FADTK_TPU_FLASH_ATTENTION", "1")
    cfg = SpeechEncoderConfig(
        **SMALL,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        attention_type=attention_type,
        num_buckets=64,
        max_bucket_distance=160,
    )
    params = cast_params_bf16(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)))
    audio = (np.random.default_rng(4).standard_normal(3000) * 0.1).astype(np.float32)

    ref_states, _ = speech_encoder_forward(
        cfg, params, jnp.asarray(audio[None]), jnp.asarray([3000], jnp.int32)
    )
    n_ref = ref_states.shape[2]

    assert _pick_block(818) == 512  # 2x512 grid: the skip path is live

    padded = np.zeros(16384, np.float32)
    padded[:3000] = audio
    states, mask = speech_encoder_forward(
        cfg, params, jnp.asarray(padded[None]), jnp.asarray([3000], jnp.int32)
    )
    n_valid = int(np.asarray(mask).sum())
    assert n_valid == n_ref
    got = np.asarray(states[:, :, :n_valid], np.float32)
    want = np.asarray(ref_states, np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert np.isfinite(np.asarray(states, np.float32)).all()
