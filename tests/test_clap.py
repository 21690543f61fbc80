"""CLAP/HTSAT tests: bicubic interp matrix vs torch, Swin audio tower vs HF
ClapAudioModel (small config and real HTSAT-tiny geometry), projection parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fadtk_tpu.models.htsat import (
    HTSATConfig,
    bicubic_interp_matrix,
    clap_audio_projection,
    htsat_forward,
)
from fadtk_tpu.weights.clap import convert_clap_audio


def test_bicubic_matrix_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 1, 100, 16)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x), (256, 16), mode="bicubic", align_corners=True
        )
        .numpy()
    )
    m = bicubic_interp_matrix(100, 256)
    ours = np.einsum("ot,bcts->bcos", m, x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def _hf_audio_model(cfg: HTSATConfig, seed: int, projection: bool):
    from transformers.models.clap.configuration_clap import ClapAudioConfig
    from transformers.models.clap.modeling_clap import (
        ClapAudioModel,
        ClapAudioModelWithProjection,
    )

    hf_cfg = ClapAudioConfig(
        spec_size=cfg.spec_size,
        patch_size=cfg.patch_size,
        patch_stride=[cfg.patch_stride, cfg.patch_stride],
        num_mel_bins=cfg.num_mel_bins,
        window_size=cfg.window_size,
        depths=list(cfg.depths),
        num_attention_heads=list(cfg.num_heads),
        patch_embeds_hidden_size=cfg.embed_dim,
        num_classes=10,
        enable_fusion=False,
        drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        projection_dim=32,
        projection_hidden_act="relu",
    )
    torch.manual_seed(seed)
    model = (ClapAudioModelWithProjection if projection else ClapAudioModel)(hf_cfg)
    return model.eval()


SMALL = HTSATConfig(
    spec_size=64, patch_size=4, patch_stride=4, num_mel_bins=16, window_size=4,
    depths=(1, 1), num_heads=(2, 4), embed_dim=8,
)


def test_htsat_small_matches_hf():
    hf = _hf_audio_model(SMALL, seed=0, projection=False)
    # Perturb batch-norm stats so that path is actually exercised.
    with torch.no_grad():
        hf.audio_encoder.batch_norm.running_mean.uniform_(-0.5, 0.5)
        hf.audio_encoder.batch_norm.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 1, 100, 16)).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(feats)).pooler_output.numpy()

    sd = {f"audio_model.{k}": v for k, v in hf.state_dict().items()}
    params = convert_clap_audio(sd, SMALL)
    ours = np.asarray(htsat_forward(SMALL, params, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_htsat_tiny_real_geometry_matches_hf():
    from fadtk_tpu.models.htsat import HTSAT_TINY

    hf = _hf_audio_model(HTSAT_TINY, seed=2, projection=True)
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 1, 1001, 64)).astype(np.float32) * 0.5

    with torch.no_grad():
        out = hf(torch.from_numpy(feats))
        ref = out.audio_embeds.numpy()

    params = convert_clap_audio(hf.state_dict(), HTSAT_TINY)
    pooled = htsat_forward(HTSAT_TINY, params, jnp.asarray(feats))
    ours = np.asarray(clap_audio_projection(params["audio_projection"], pooled))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_laion_checkpoint_key_style():
    """Converter must accept the original laion_clap tree (fused qkv)."""
    hf = _hf_audio_model(SMALL, seed=3, projection=False)
    sd = hf.state_dict()

    laion_sd = {}
    for k, v in sd.items():
        k2 = "audio_branch." + k.removeprefix("audio_encoder.")
        k2 = (
            k2.replace("batch_norm", "bn0")
            .replace(".attention.self.", ".attn.")
            .replace(".attention.output.dense", ".attn.proj")
            .replace("layernorm_before", "norm1")
            .replace("layernorm_after", "norm2")
            .replace(".intermediate.dense", ".mlp.fc1")
            .replace(".output.dense", ".mlp.fc2")
        )
        laion_sd[k2] = v
    # Fuse q/k/v like the original checkpoints.
    fused = {}
    for k in list(laion_sd):
        if ".attn.query.weight" in k:
            base = k.replace(".query.weight", "")
            for suffix in ("weight", "bias"):
                fused[f"{base}.qkv.{suffix}"] = torch.cat(
                    [laion_sd[f"{base}.{n}.{suffix}"] for n in ("query", "key", "value")]
                )
            for n in ("query", "key", "value"):
                for suffix in ("weight", "bias"):
                    del laion_sd[f"{base}.{n}.{suffix}"]
            # relative bias table lives under attn. already
    laion_sd.update(fused)
    laion_sd = {f"module.{k}": v for k, v in laion_sd.items()}

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 1, 64, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(feats)).pooler_output.numpy()
    params = convert_clap_audio(laion_sd, SMALL)
    ours = np.asarray(htsat_forward(SMALL, params, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


@pytest.mark.parametrize("g", [2, 4, 8])
def test_swin_window_merge_matches_unmerged(monkeypatch, g):
    """FADTK_TPU_SWIN_MERGE packs G windows per attention call behind a
    static block-diagonal mask (MXU tile fill: a lone window is a (64, hd)
    x (hd, 64) matmul at ~5% of a 128^3 tile). Off-block logits sit at -1e9
    and underflow to exactly 0 after the softmax shift, so merged must
    reproduce the per-window forward (measured bit-exact on CPU; tolerance
    here allows XLA retiling the differently-shaped einsum)."""
    import jax

    from fadtk_tpu.models.htsat import HTSAT_TINY, init_htsat_params

    params = init_htsat_params(HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=None)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 1, 1001, 64)) * 0.5, jnp.float32)

    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", "1")
    base = np.asarray(jax.jit(lambda p, x: htsat_forward(HTSAT_TINY, p, x))(params, feats))
    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", str(g))
    merged = np.asarray(jax.jit(lambda p, x: htsat_forward(HTSAT_TINY, p, x))(params, feats))
    np.testing.assert_allclose(merged, base, rtol=2e-6, atol=2e-6)


def test_swin_window_merge_base_config(monkeypatch):
    """Same merge-equivalence pin at the HTSAT-base geometry (embed 128,
    head_dim 32 — the clap-laion-music tower), so both production head_dims
    are covered."""
    import jax

    from fadtk_tpu.models.htsat import HTSAT_BASE, init_htsat_params

    params = init_htsat_params(HTSAT_BASE, jax.random.PRNGKey(1), projection_dim=None)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 1, 600, 64)) * 0.5, jnp.float32)

    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", "1")
    base = np.asarray(jax.jit(lambda p, x: htsat_forward(HTSAT_BASE, p, x))(params, feats))
    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", "2")
    merged = np.asarray(jax.jit(lambda p, x: htsat_forward(HTSAT_BASE, p, x))(params, feats))
    np.testing.assert_allclose(merged, base, rtol=2e-6, atol=2e-6)


def test_swin_merge_zero_means_off(monkeypatch):
    """FADTK_TPU_SWIN_MERGE=0 must disable merging (review finding: it
    silently fell through to the default 2)."""
    from fadtk_tpu.models.htsat import _swin_merge_factor

    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", "0")
    assert _swin_merge_factor() == 1
    monkeypatch.setenv("FADTK_TPU_SWIN_MERGE", "4")
    assert _swin_merge_factor() == 4
    monkeypatch.delenv("FADTK_TPU_SWIN_MERGE")
    assert _swin_merge_factor() == 2


def test_ln_onepass_bf16_matches_f32_twopass():
    """bf16 _ln uses one-pass f32-accumulated moments (PERF.md 3.6); it must
    stay within bf16 rounding of the f32 two-pass reference, and the f32 path
    itself must keep the exact two-pass formula (score-parity contract)."""
    from fadtk_tpu.models.htsat import _ln

    rng = np.random.default_rng(7)
    # offset-heavy input: the worst case for the E[x^2]-E[x]^2 cancellation
    x = (rng.standard_normal((4, 64, 96)) * 0.3 + 5.0).astype(np.float32)
    p = {
        "scale": jnp.asarray(rng.standard_normal(96).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(96).astype(np.float32)),
    }
    ref = np.asarray(_ln(jnp.asarray(x), p))

    pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    got = np.asarray(_ln(xb, pb).astype(jnp.float32))

    # The baseline bf16 error is input rounding through the normalize (the
    # small per-row sigma amplifies it ~ sigma^-1): measure it with the OLD
    # bf16 path (two-pass moments straight over bf16) and require the
    # one-pass f32-accumulated path to be no worse. It is typically BETTER
    # (f32 accumulation); the probe measured 2.5e-4 whole-model deviation.
    mu_b = jnp.mean(xb, axis=-1, keepdims=True)
    var_b = jnp.var(xb, axis=-1, keepdims=True)
    import jax

    old = np.asarray(
        ((xb - mu_b) * jax.lax.rsqrt(var_b + 1e-5) * pb["scale"] + pb["bias"]).astype(
            jnp.float32
        )
    )
    denom = np.maximum(np.abs(ref), 1.0)
    dev_new = np.max(np.abs(got - ref) / denom)
    dev_old = np.max(np.abs(old - ref) / denom)
    assert dev_new <= dev_old * 1.5
    assert dev_new < 0.25  # absolute sanity bound

    # f32 path unchanged: bitwise-equal to the explicit two-pass formula
    xj = jnp.asarray(x)
    mu = jnp.mean(xj, axis=-1, keepdims=True)
    var = jnp.var(xj, axis=-1, keepdims=True)
    expect = np.asarray((xj - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"])
    np.testing.assert_array_equal(ref, expect)


def test_ln_onepass_constant_rows_no_nan():
    """Near-constant rows: the one-pass cancellation can dip negative; the
    clamp must keep rsqrt finite."""
    from fadtk_tpu.models.htsat import _ln

    x = jnp.full((2, 8, 32), 3.0, dtype=jnp.bfloat16)
    p = {"scale": jnp.ones(32, jnp.bfloat16), "bias": jnp.zeros(32, jnp.bfloat16)}
    out = np.asarray(_ln(x, p).astype(jnp.float32))
    assert np.isfinite(out).all()
