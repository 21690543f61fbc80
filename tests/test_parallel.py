"""Multi-chip sharding tests on the 8-device CPU mesh: the tensor+data-parallel
evaluation step must reproduce the single-device encoder exactly (same math,
psum placement only), and sharded statistics must equal host statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fadtk_tpu.metric.stats import statistics_from_frame_iter
from fadtk_tpu.models.speech.config import SpeechEncoderConfig
from fadtk_tpu.models.speech.encoder import (
    init_speech_encoder_params,
    speech_encoder_forward,
)
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.parallel.tp import make_sharded_eval_step

CFG_KW = dict(
    conv_dim=(32, 32),
    conv_kernel=(10, 3),
    conv_stride=(5, 2),
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    do_normalize=True,
)


@pytest.mark.parametrize(
    "attention_type,tp,stable",
    [
        ("standard", 1, False),
        ("standard", 2, False),
        ("standard", 4, False),
        ("standard", 2, True),  # pre-norm (hubert/wavlm-large style)
        ("wavlm", 2, False),
    ],
)
def test_sharded_eval_step_matches_single_device(attention_type, tp, stable):
    cfg = SpeechEncoderConfig(
        **CFG_KW,
        attention_type=attention_type,
        num_buckets=64,
        max_bucket_distance=160,
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group",
        conv_bias=stable,
    )
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))

    b, t = 8, 2000
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((b, t)).astype(np.float32) * 0.2
    num_valid = rng.integers(1200, 2001, size=b).astype(np.int32)

    layer = cfg.num_layers  # final layer tap

    # Single-device ground truth, including the float16 storage round-trip.
    states, mask = speech_encoder_forward(cfg, params, jnp.asarray(audio), jnp.asarray(num_valid))
    frames, masks = np.asarray(states[layer]), np.asarray(mask)
    frame_list = [
        frames[i, masks[i] > 0].astype(np.float16).astype(np.float64) for i in range(b)
    ]
    mu_ref, cov_ref = statistics_from_frame_iter(iter(frame_list), cfg.hidden_size)

    mesh = make_mesh(8, tp=tp)
    step = make_sharded_eval_step(cfg, params, mesh, layer)
    mu, cov, n = step(params, jnp.asarray(audio), jnp.asarray(num_valid))

    assert int(n) == sum(f.shape[0] for f in frame_list)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cov), cov_ref, atol=2e-4)
