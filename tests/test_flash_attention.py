"""Fused flash-attention kernel == XLA attention core (interpret mode on the
CPU test mesh; the compiled kernel is exercised on real TPU by bench.py).

The kernel replaces the XLA path in the speech encoders and the Whisper
encoder (fadtk_tpu/ops/flash_attention.py); WavLM's gated relative position
bias streams through the kernel factorized (gate ⊙ position_bias), never
materializing the dense (B, H, T, T) term. Tolerances are float32-roundoff:
the online softmax reorders the reduction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fadtk_tpu.ops.flash_attention import flash_attention, flash_attention_packed


def _ref(q, k, v, nv):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhtd,bhsd->bhts", q * scale, k).astype(jnp.float32)
    mask = jnp.arange(q.shape[2])[None, :] < nv[:, None]
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@pytest.mark.parametrize("grouped", [True, False])
@pytest.mark.parametrize(
    "b,h,t,d",
    [(2, 3, 499, 64), (1, 2, 130, 32), (2, 1, 512, 64), (1, 4, 1500, 64)],
)
def test_matches_xla_attention(b, h, t, d, grouped):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray(rng.integers(1, t + 1, size=b), jnp.int32)

    out = flash_attention(q, k, v, nv, interpret=True, grouped=grouped)
    ref = _ref(q, k, v, nv)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=3e-6
        )
    # Padded rows must stay finite (they feed later layers' K/V, which the
    # key mask then excludes — NaNs would propagate through masked softmax).
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize(
    "b,h,t,d", [(2, 3, 499, 64), (1, 2, 130, 32), (2, 4, 700, 64)]
)
def test_packed_matches_xla_attention(b, h, t, d):
    """flash_attention_packed consumes/produces the (B, T, H*D) projection
    layout (the model call-site form) — same math as the XLA core."""
    from fadtk_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray(rng.integers(1, t + 1, size=b), jnp.int32)

    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out = flash_attention_packed(
        pack(q), pack(k), pack(v), nv, num_heads=h,
        block_q=384 if t == 700 else None, interpret=True,
    )
    out = out.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    ref = _ref(q, k, v, nv)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=3e-6
        )
    assert bool(jnp.isfinite(out).all())


def test_packed_bfloat16_and_no_mask():
    from fadtk_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.default_rng(12)
    b, h, t, d = 2, 4, 260, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.bfloat16)
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out = flash_attention_packed(pack(q), pack(k), pack(v), None, num_heads=h, interpret=True)
    ref = _ref(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        jnp.full((b,), t, jnp.int32),
    )
    out = out.reshape(b, t, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)
    assert out.dtype == jnp.float32


def test_grouped_equals_ungrouped_ragged_multiblock():
    """The grouped (all-heads-per-step) grid computes the same function as
    the per-(b,h) grid: ragged n_valid across a multi-kv-block length so the
    clamped index maps and per-head online-softmax state are all exercised."""
    rng = np.random.default_rng(7)
    b, h, t, d = 3, 4, 700, 64  # pads to 768; >1 kv block at block=384
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray([700, 130, 385], jnp.int32)
    g = flash_attention(q, k, v, nv, block_q=384, interpret=True, grouped=True)
    u = flash_attention(q, k, v, nv, block_q=384, interpret=True, grouped=False)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(g[bi, :, :n]), np.asarray(u[bi, :, :n]), atol=2e-6
        )
    assert bool(jnp.isfinite(g).all())


def test_no_mask_means_all_valid():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
    out = flash_attention(q, k, v, None, interpret=True)
    ref = _ref(q, k, v, jnp.asarray([200], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_padded_batch_matches_unpadded():
    """The mask-exactness invariant: a clip embedded inside a padded batch
    equals the same clip at its exact length (valid rows only)."""
    rng = np.random.default_rng(2)
    t_full, t_short = 384, 250
    q = jnp.asarray(rng.standard_normal((1, 2, t_full, 64)), jnp.float32)
    k, v = (
        jnp.asarray(rng.standard_normal((1, 2, t_full, 64)), jnp.float32)
        for _ in range(2)
    )

    padded = flash_attention(q, k, v, jnp.asarray([t_short]), interpret=True)
    alone = flash_attention(
        q[:, :, :t_short], k[:, :, :t_short], v[:, :, :t_short],
        jnp.asarray([t_short]), interpret=True,
    )
    # Same block geometry is not guaranteed (different padding), so f32
    # roundoff tolerance rather than bit equality.
    np.testing.assert_allclose(
        np.asarray(padded[:, :, :t_short]), np.asarray(alone), atol=3e-6
    )


def _ref_biased(q, k, v, nv, pb, gate):
    """XLA wavlm_attention core: logits + gate[..., None] * pb + key mask."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhtd,bhsd->bhts", q * scale, k).astype(jnp.float32)
    s = s + gate[..., None] * pb[None]
    mask = jnp.arange(q.shape[2])[None, :] < nv[:, None]
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@pytest.mark.parametrize("b,h,t,d", [(2, 3, 499, 64), (1, 2, 130, 32)])
def test_factorized_bias_matches_wavlm_core(b, h, t, d):
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, t)), jnp.float32)
    nv = jnp.asarray(rng.integers(1, t + 1, size=b), jnp.int32)

    out = flash_attention(q, k, v, nv, interpret=True, position_bias=pb, gate=gate)
    ref = _ref_biased(q, k, v, nv, pb, gate)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=5e-6
        )
    assert bool(jnp.isfinite(out).all())


def test_factorized_bias_bf16():
    rng = np.random.default_rng(5)
    b, h, t, d = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.bfloat16)
    pb = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, t)), jnp.float32)
    nv = jnp.asarray([256, 90], jnp.int32)

    out = flash_attention(q, k, v, nv, interpret=True, position_bias=pb, gate=gate)
    assert out.dtype == jnp.bfloat16
    ref = _ref_biased(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        nv, pb, gate,
    )
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n], np.float32), np.asarray(ref[bi, :, :n]),
            atol=0.03,
        )


def test_wavlm_attention_flash_equals_xla(monkeypatch):
    """Model-level: wavlm_attention with the kernel forced on (interpret via
    monkeypatched flash_attention) == the XLA gated-bias path."""
    import importlib

    import fadtk_tpu.models.speech.encoder as enc

    fa = importlib.import_module("fadtk_tpu.ops.flash_attention")
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        wavlm_attention,
        wavlm_position_bias,
    )

    cfg = SpeechEncoderConfig(attention_type="wavlm", num_buckets=320,
                              max_bucket_distance=800)
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    p = params["encoder"]["layers"][0]["attention"]

    rng = np.random.default_rng(6)
    b, t = 2, 120
    x = jnp.asarray(rng.standard_normal((b, t, cfg.hidden_size)), jnp.float32) * 0.1
    nv = jnp.asarray([t, 70], jnp.int32)
    mask = (jnp.arange(t)[None, :] < nv[:, None]).astype(jnp.float32)
    key_bias = (1.0 - mask)[:, None, None, :] * jnp.finfo(jnp.float32).min
    pb = wavlm_position_bias(cfg, p["rel_attn_embed"], t)

    ref = wavlm_attention(cfg, p, x, key_bias, pb, frame_valid=None)  # XLA path

    monkeypatch.setenv("FADTK_TPU_FLASH_ATTENTION", "1")
    real = fa.flash_attention_packed
    monkeypatch.setattr(
        fa, "flash_attention_packed",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}),
    )
    out = wavlm_attention(cfg, p, x, key_bias, pb, frame_valid=nv)
    assert enc.use_flash_attention(x.dtype, nv) is False  # f32 stays XLA
    # Force the kernel by calling with bf16 inputs.
    xb = x.astype(jnp.bfloat16)
    out_bf = wavlm_attention(cfg, p, xb, key_bias, pb, frame_valid=nv)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out_bf[bi, :n], np.float32), np.asarray(ref[bi, :n]),
            atol=0.05,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_adaptive_block_choice():
    """T=749 (24 kHz 10 s bucket) must not pad to 1024 (+78% attention work):
    the adaptive choice runs one single 768 block. Exact 512-multiples keep
    the measured-optimal 512 config (ties prefer it)."""
    from fadtk_tpu.ops.flash_attention import _pick_block

    assert _pick_block(749) == 768
    assert _pick_block(499) == 512
    assert _pick_block(512) == 512
    assert _pick_block(999) == 512  # pads to 1024 either way
    assert _pick_block(1499) == 512  # 1536 tie -> measured config
    assert _pick_block(130) == 256  # short sequences: one small block
    assert _pick_block(2249) == 768  # 24 kHz 30 s bucket: 2304, not 2560


def test_adaptive_block_numerics_t749():
    """The 768-block single-kv-block geometry is numerically the same
    attention (MERT's 10 s bucket shape, scaled down in batch/heads)."""
    rng = np.random.default_rng(7)
    b, h, t, d = 1, 2, 749, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray([680], jnp.int32)
    out = flash_attention(q, k, v, nv, interpret=True)
    ref = _ref(q, k, v, nv)
    np.testing.assert_allclose(
        np.asarray(out[0, :, :680]), np.asarray(ref[0, :, :680]), atol=3e-6
    )
    assert bool(jnp.isfinite(out).all())


def test_masked_kv_blocks_skipped_exact():
    """Rows whose n_valid ends blocks early (kv blocks fully beyond n_valid
    are skipped and their DMA index is clamped) still match the reference —
    the skipped blocks' exact contribution is zero."""
    rng = np.random.default_rng(8)
    b, h, t, d = 3, 2, 640, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    # 256-blocks at t=640 -> 3 kv blocks; nv=100 skips blocks 1-2, nv=300
    # skips block 2, nv=640 computes all three.
    nv = jnp.asarray([100, 300, 640], jnp.int32)
    out = flash_attention(q, k, v, nv, block_q=256, block_kv=256, interpret=True)
    ref = _ref(q, k, v, nv)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=3e-6
        )
    assert bool(jnp.isfinite(out).all())


def test_masked_kv_blocks_skipped_with_bias():
    """Same skip-exactness through the factorized-bias (WavLM) kernel."""
    rng = np.random.default_rng(9)
    b, h, t, d = 2, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, t)), jnp.float32)
    nv = jnp.asarray([120, 512], jnp.int32)
    out = flash_attention(
        q, k, v, nv, block_q=128, block_kv=128, interpret=True,
        position_bias=pb, gate=gate,
    )
    ref = _ref_biased(q, k, v, nv, pb, gate)
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n]), np.asarray(ref[bi, :, :n]), atol=5e-6
        )


def test_bfloat16_path():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    nv = jnp.asarray([256, 100], jnp.int32)
    out = flash_attention(q, k, v, nv, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), nv)
    for bi in range(2):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :n], np.float32),
            np.asarray(ref[bi, :, :n]),
            atol=0.03,  # bf16 p@v accumulation
        )


def test_explicit_single_block_size_fixes_both():
    """Passing only one explicit block size must not mix with an adaptive
    default that doesn't divide the padded length (was: t=749 with
    block_q=512 left rows 512..748 unwritten -> NaN)."""
    rng = np.random.default_rng(10)
    b, h, t, d = 1, 2, 749, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    nv = jnp.asarray([t], jnp.int32)
    out = flash_attention(q, k, v, nv, block_q=512, interpret=True)
    ref = _ref(q, k, v, nv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)

    with pytest.raises(AssertionError, match="divide the padded length"):
        flash_attention(q, k, v, nv, block_q=512, block_kv=768, interpret=True)

@pytest.mark.parametrize("b,h,t,d", [(2, 3, 499, 64), (1, 2, 130, 32)])
def test_packed_factorized_bias_matches_wavlm_core(b, h, t, d):
    """The packed-heads kernel's streamed (H, BQ, BK) bias slabs + (B, T, H)
    gate must reproduce the dense gated-bias attention (wavlm routes here
    in bf16 since the packed-bias variant landed)."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, t)), jnp.float32)
    nv = jnp.asarray(rng.integers(1, t + 1, size=b), jnp.int32)

    packed = lambda a: a.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    out = flash_attention_packed(
        packed(q), packed(k), packed(v), nv,
        pb, gate.transpose(0, 2, 1), num_heads=h, interpret=True,
    )
    ref = _ref_biased(q, k, v, nv, pb, gate)
    ref_packed = np.asarray(packed(ref))
    for bi in range(b):
        n = int(nv[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :n]), ref_packed[bi, :n], atol=5e-6
        )
    assert bool(jnp.isfinite(out).all())


def test_packed_block_configs_pinned():
    """The whole-model-A/B'd block configs of the PLAIN packed kernel must
    not move when the bias-path VMEM terms change (a review caught the gate
    term being added unconditionally, which silently shrank MERT's blocks)."""
    from fadtk_tpu.ops.flash_attention import _fit_packed_blocks, _pick_block

    # w2v2 bf16: T=499 -> 512 start, hd=768, stays 512/512
    assert _fit_packed_blocks(512, 512, 768, 2, 12, 0, False) == (512, 512)
    # w2v2 f32: shrinks once to 256/512
    assert _fit_packed_blocks(512, 512, 768, 4, 12, 0, False) == (256, 512)
    # MERT bf16: T=749 -> single 768 block start, fits at 384/768
    assert _pick_block(749) == 768
    assert _fit_packed_blocks(768, 768, 768, 2, 12, 0, False) == (384, 768)
    # wavlm bias path shrinks further to make room for the (H, BQ, BK) slab
    bq, bk = _fit_packed_blocks(512, 512, 768, 2, 12, 4, True)
    assert max(bq, bk) <= 512 and (bq, bk) != (512, 512)
