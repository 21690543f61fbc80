"""bf16 throughput mode (FADTK_TPU_BF16 / --bf16, models/precision.py).

The reference is float32-only; the bf16 mode is a TPU-native addition. These
tests pin its contract:

- params cast to bfloat16 at ensure_loaded; compute follows param dtype;
- embeddings stay float16 on disk and close to the float32 ones;
- caches/stats segregate under '<model>-bf16' (never mixing precisions).

(DAC pinned SUPPORTS_BF16=False through round 3; the pin was an artifact
of XLA's f32 sin dominating its forward and is lifted — see models/dac.py.)
"""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax
import jax.numpy as jnp

from fadtk_tpu.models.precision import bf16_enabled, cast_params_bf16, param_dtype


def _leaf_dtypes(params):
    return {str(leaf.dtype) for leaf in jax.tree.leaves(params)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)}


def test_env_parsing(monkeypatch):
    for v, expect in [("1", True), ("true", True), ("ON", True),
                      ("0", False), ("", False), ("no", False)]:
        monkeypatch.setenv("FADTK_TPU_BF16", v)
        assert bf16_enabled() is expect
    monkeypatch.delenv("FADTK_TPU_BF16")
    assert bf16_enabled() is False


def test_param_dtype_and_cast():
    params = {"a": {"kernel": jnp.ones((2, 2), jnp.float32)},
              "ids": jnp.zeros((3,), jnp.int32)}
    assert param_dtype(params) == jnp.float32
    cast = cast_params_bf16(params)
    assert cast["a"]["kernel"].dtype == jnp.bfloat16
    assert cast["ids"].dtype == jnp.int32  # ints untouched
    assert param_dtype(cast) == jnp.bfloat16


def test_cache_name_suffix(monkeypatch):
    from fadtk_tpu.models.dac import DACModel
    from fadtk_tpu.models.wav2vec2 import W2V2Model

    m = W2V2Model("base", layer=12)
    assert m.cache_name == m.name
    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    assert m.cache_name == f"{m.name}-bf16"
    # DAC joined the standard contract when the Cody-Waite snake removed
    # the dtype-independent sin bottleneck (bf16 now buys +14%).
    d = DACModel()
    assert d.cache_name == f"{d.name}-bf16"


def test_dac_bf16_close(monkeypatch):
    from fadtk_tpu.models.dac import DACModel

    audio = np.random.default_rng(3).standard_normal(44100) * 0.1
    e32, e16 = _bf16_vs_f32(DACModel, audio, monkeypatch)
    _assert_close(e32, e16, mad_tol=0.15)


def _bf16_vs_f32(make_model, audio, monkeypatch):
    """Embed the same clip with f32 and bf16 instances of one model."""
    monkeypatch.delenv("FADTK_TPU_BF16", raising=False)
    m32 = make_model()
    e32 = m32.get_embedding(audio)

    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    m16 = make_model()
    m16.ensure_loaded()
    assert "bfloat16" in _leaf_dtypes(m16.params)
    e16 = m16.get_embedding(audio)
    monkeypatch.delenv("FADTK_TPU_BF16")
    return e32, e16


def _assert_close(e32, e16, mad_tol):
    assert e16.dtype == np.float16  # storage format unchanged
    assert e16.shape == e32.shape
    a, b = e32.astype(np.float64), e16.astype(np.float64)
    scale = np.abs(a).mean() + 1e-12
    mad = np.abs(a - b).mean() / scale
    assert mad < mad_tol, f"bf16 deviates {mad:.4f} (> {mad_tol}) from f32"


def test_speech_bf16_close(monkeypatch):
    from fadtk_tpu.models.wav2vec2 import W2V2Model

    audio = np.random.default_rng(0).standard_normal(16000) * 0.1
    e32, e16 = _bf16_vs_f32(lambda: W2V2Model("base", layer=12), audio, monkeypatch)
    _assert_close(e32, e16, mad_tol=0.15)  # 12 transformer layers compound bf16 noise


def test_vggish_bf16_close(monkeypatch):
    from fadtk_tpu.models.vggish import VGGishModel

    audio = np.random.default_rng(1).standard_normal(32000) * 0.1
    e32, e16 = _bf16_vs_f32(VGGishModel, audio, monkeypatch)
    _assert_close(e32, e16, mad_tol=0.1)


def test_encodec_bf16_close(monkeypatch):
    from fadtk_tpu.models.encodec import EncodecEmbModel

    audio = np.random.default_rng(2).standard_normal(24000) * 0.1
    e32, e16 = _bf16_vs_f32(lambda: EncodecEmbModel("24k"), audio, monkeypatch)
    _assert_close(e32, e16, mad_tol=0.1)


def test_cdpam_bf16_close(monkeypatch):
    from fadtk_tpu.models.cdpam import CdpamModel

    audio = (np.random.default_rng(3).standard_normal(33075) * 3000).astype(np.float32)
    e32, e16 = _bf16_vs_f32(lambda: CdpamModel("acoustic"), audio, monkeypatch)
    _assert_close(e32, e16, mad_tol=0.1)


def test_bf16_cache_segregation_e2e(tmp_path, monkeypatch):
    """--bf16 embeds cache under embeddings/<model>-bf16 and never touch the
    float32 cache; scoring works end-to-end in the mode."""
    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    from fadtk_tpu.models.vggish import VGGishModel
    from fadtk_tpu.runner.batch import cache_embedding_files
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    def make(name, seed, n=3):
        d = tmp_path / name
        d.mkdir()
        rng = np.random.default_rng(seed)
        sr = 16000
        for i in range(n):
            t = np.arange(sr) / sr
            x = 0.4 * np.sin(2 * np.pi * rng.uniform(100, 2000) * t)
            write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)
        return d

    baseline, eval_ = make("b", 0), make("e", 9)

    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    model = VGGishModel()
    for d in (baseline, eval_):
        cache_embedding_files(d, model, workers=2)
        assert (d / "embeddings" / "vggish-bf16").is_dir()
        assert not (d / "embeddings" / "vggish").exists()
        for f in (d / "embeddings" / "vggish-bf16").glob("*.npy"):
            assert np.load(f).dtype == np.float16

    fad = FrechetAudioDistance(model, load_model=False)
    score = fad.score(baseline, eval_)
    assert np.isfinite(score) and score >= 0
    # Stats cached under the bf16 name too.
    assert (baseline / "stats" / "vggish-bf16").is_dir()


def test_bf16_device_pipeline_tp(tmp_path, monkeypatch):
    """--bf16 + --device-pipeline: the (dp, tp) sharded speech step runs with
    bf16 params and its Gaussian stays close to the f32 one."""
    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    from fadtk_tpu.models.wav2vec2 import W2V2Model
    from fadtk_tpu.parallel.mesh import make_mesh
    from fadtk_tpu.runner.device_pipeline import dataset_stats_device

    d = tmp_path / "ds"
    d.mkdir()
    rng = np.random.default_rng(0)
    sr = 16000
    for i in range(4):
        t = np.arange(int(sr * 1.5)) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)

    mesh = make_mesh(8, tp=2)

    monkeypatch.delenv("FADTK_TPU_BF16", raising=False)
    m32 = W2V2Model("base", layer=12)
    mu32, cov32, n32 = dataset_stats_device(m32, d, mesh=mesh, batch=4)

    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    m16 = W2V2Model("base", layer=12)
    mu16, cov16, n16 = dataset_stats_device(m16, d, mesh=mesh, batch=4)
    assert "bfloat16" in _leaf_dtypes(m16.params)

    assert n16 == n32  # masking/frame counts are precision-independent
    scale = np.abs(mu32).mean() + 1e-12
    assert np.abs(mu16 - mu32).mean() / scale < 0.2
    assert np.isfinite(cov16).all()


def test_cli_flag_exposed():
    """`fadtk --bf16` and `fadtk-embeds --bf16` parse (flag plumbing)."""
    import fadtk_tpu.cli.embeds as embeds_cli
    import fadtk_tpu.cli.main as main_cli
    import inspect

    assert "--bf16" in inspect.getsource(main_cli)
    assert "--bf16" in inspect.getsource(embeds_cli)


def test_bf16_latch_survives_env_flip(monkeypatch):
    """Once loaded, flipping FADTK_TPU_BF16 cannot desynchronize the compute
    dtype from cache_name (ADVICE r2): a model cast to bf16 keeps reporting
    bf16=True / '<name>-bf16' after the env var is cleared, and a float32
    model stays float32 after the env var is set."""
    from fadtk_tpu.models.wav2vec2 import W2V2Model

    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    m16 = W2V2Model("base", layer=12)
    m16.ensure_loaded()
    assert "bfloat16" in _leaf_dtypes(m16.params)
    monkeypatch.delenv("FADTK_TPU_BF16")
    assert m16.bf16 is True  # latched with the cast params
    assert m16.cache_name.endswith("-bf16")

    m32 = W2V2Model("base", layer=12)
    m32.ensure_loaded()
    assert _leaf_dtypes(m32.params) == {"float32"}
    monkeypatch.setenv("FADTK_TPU_BF16", "1")
    assert m32.bf16 is False  # latched float32
    assert m32.cache_name == m32.name


def test_gelu_precision_policy():
    """f32 keeps exact erf GELU (HF parity) — composed by hand as torch's
    0.5*x*(1+erf(x/sqrt2)) rather than jax's erfc(-x/sqrt2) form, which pays
    an unfused extra HBM pass on TPU (scripts/gelu_fusion_probe.py: w2v2-f32
    299.9 -> 266.3 ms). The two forms agree to f32 roundoff. bf16 uses the
    tanh approximation (erf measured 52 ms of a 300 ms w2v2-base forward;
    the 3e-4 approximation error is an order below bf16's ~4e-3 rounding)."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.special as ss

    from fadtk_tpu.models.precision import gelu

    x32 = jnp.linspace(-4.0, 4.0, 513, dtype=jnp.float32)
    got = np.asarray(gelu(x32))
    # the torch formula, evaluated in float64
    x64 = np.asarray(x32, np.float64)
    want = 0.5 * x64 * (1.0 + ss.erf(x64 / math.sqrt(2.0)))
    np.testing.assert_allclose(got, want, atol=3e-7)
    # and still f32-roundoff-close to jax's erfc-based builtin
    np.testing.assert_allclose(
        got, np.asarray(jax.nn.gelu(x32, approximate=False)), atol=2e-6
    )
    x16 = x32.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(gelu(x16)), np.asarray(jax.nn.gelu(x16, approximate=True))
    )
    assert gelu(x16).dtype == jnp.bfloat16
