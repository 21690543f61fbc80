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


def test_step_builders_memoized():
    """The step builders must return the SAME executable across calls — a
    fresh jax.jit per dataset pass misses jax's in-memory executable cache
    and re-compiles the whole forward every scoring run (the 3x e2e pipeline
    regression the round-3 import-time persistent compile cache masked)."""
    cfg = SpeechEncoderConfig(
        **CFG_KW,
        attention_type="standard",
        feat_extract_norm="group",
    )
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, tp=1)
    s1 = make_sharded_eval_step(cfg, params, mesh, 1)
    s2 = make_sharded_eval_step(cfg, params, mesh, 1)
    assert s1 is s2
    # Different tap layer or mesh = different executable.
    assert make_sharded_eval_step(cfg, params, mesh, 2) is not s1

    from fadtk_tpu.parallel.dp import DpChunkSpec, make_dp_chunk_stats_step

    spec = DpChunkSpec(
        forward=lambda p, x: x @ p,
        make_chunks=lambda c: (c.reshape(-1, 4),),
        params=jnp.eye(4, dtype=jnp.float32),
        num_features=4,
    )
    r1 = make_dp_chunk_stats_step(mesh, spec)
    assert make_dp_chunk_stats_step(mesh, spec) is r1


def test_model_dp_specs_latched():
    """dataset_stats_device reuses one spec (hence one executable chain) per
    model instance across dataset passes."""
    import os

    os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.device_pipeline import _model_dp_specs

    model = get_model("clap-laion-audio")
    model.ensure_loaded()
    first = _model_dp_specs(model)
    assert _model_dp_specs(model) is first
    assert first[0] is not None
