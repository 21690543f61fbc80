"""In-memory device convert (runner/convert.py + dsp/resample.convert_device):
the exactness properties it relies on, parity with the host convert cache, and
the device pipeline end-to-end on a fresh (uncached) dataset."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax.numpy as jnp

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
from fadtk_tpu.dsp.resample import (
    convert_device,
    resample_batch,
    resample_kaiser,
    resampled_length,
    source_samples_needed,
)
from fadtk_tpu.runner.convert import ClipLoader
from fadtk_tpu.runner.fad import FrechetAudioDistance


def _tone(sr, seconds, seed, noise=0.02):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * rng.uniform(150, 2000) * t)
    return (x + noise * rng.standard_normal(t.shape[0])).astype(np.float32)


def test_quantization_formula_matches_cache_writer():
    """f32 round/clip on device == the cache writer's f64 rint/clip, including
    the clamp edges and exact .5 ties (round-half-even both ways)."""
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [
            rng.uniform(-1.2, 1.2, 4096).astype(np.float32),
            # exact ties and edges
            np.asarray(
                [0.5 / 32768, 1.5 / 32768, -0.5 / 32768, 1.0, -1.0, 32767.4 / 32768],
                np.float32,
            ),
        ]
    )
    ref = float_to_int16(x)
    got = np.asarray(convert_device(jnp.asarray(x[None]), 16000, 16000))[0]
    np.testing.assert_array_equal(got, ref)


def test_bucket_prefix_exact():
    """Resampling a clip zero-padded into a longer bucket equals resampling
    the exact-length clip, bit-for-bit on the prefix."""
    x = _tone(44100, 2.3, 1)
    exact = np.asarray(resample_batch(jnp.asarray(x[None]), 44100, 16000))[0]
    bucket = np.zeros(44100 * 5, np.float32)
    bucket[: x.shape[0]] = x
    padded = np.asarray(resample_batch(jnp.asarray(bucket[None]), 44100, 16000))[0]
    np.testing.assert_array_equal(padded[: exact.shape[0]], exact)


def test_source_truncation_prefix_exact():
    """Cutting the source at source_samples_needed(n_out) leaves the first
    n_out output samples bit-identical to resampling the full clip."""
    x = _tone(44100, 3.0, 2)
    full = np.asarray(resample_batch(jnp.asarray(x[None]), 44100, 16000))[0]
    n_out = 16000  # keep 1 s of output
    n_src = source_samples_needed(n_out, 44100, 16000)
    assert n_src < x.shape[0]
    cut = np.asarray(resample_batch(jnp.asarray(x[None, :n_src]), 44100, 16000))[0]
    np.testing.assert_array_equal(cut[:n_out], full[:n_out])


def test_int16_ship_bit_identical():
    """int16-exact sources ship as int16 and rescale on device bit-identically
    to shipping float32."""
    q = float_to_int16(_tone(44100, 1.7, 3))
    f = (q / 32768.0).astype(np.float32)
    via_i16 = np.asarray(convert_device(jnp.asarray(q[None]), 44100, 16000))[0]
    via_f32 = np.asarray(convert_device(jnp.asarray(f[None]), 44100, 16000))[0]
    np.testing.assert_array_equal(via_i16, via_f32)


@pytest.fixture(scope="module")
def fresh_dataset(tmp_path_factory):
    """Mixed-rate, mixed-channel dataset with NO convert caches."""
    d = tmp_path_factory.mktemp("fresh")
    write_wav_int16(d / "a_44k.wav", float_to_int16(_tone(44100, 2.0, 10)), 44100)
    stereo = np.stack([_tone(48000, 1.4, 11), _tone(48000, 1.4, 12)], axis=1)
    write_wav_int16(d / "b_48k_stereo.wav", float_to_int16(stereo), 48000)
    write_wav_int16(d / "c_16k.wav", float_to_int16(_tone(16000, 1.1, 13)), 16000)
    return d


def _host_loaded(model, files, tmp_path):
    """Reference clips via the host convert-cache path, in a copied dir so the
    fresh dataset stays uncached."""
    import shutil

    ref_dir = tmp_path / "hostcopy"
    shutil.copytree(files[0].parent, ref_dir)
    fad = FrechetAudioDistance(model, load_model=False)
    return [np.asarray(fad.load_audio(ref_dir / f.name)) for f in files]


def test_clip_loader_miss_matches_host_convert(fresh_dataset, tmp_path):
    """DEVICE transport: cache-miss clips equal the host convert path up to
    the documented resample LSB wiggle (<1% of samples, 1 LSB each); same
    lengths, same dtype/scale conventions."""
    from fadtk_tpu.models.vggish import VGGishModel

    model = VGGishModel()
    files = sorted(fresh_dataset.glob("*.wav"))
    ref = _host_loaded(model, files, tmp_path)
    got = list(ClipLoader(model, workers=2, transport="device").iter_clips(files))
    assert not list(fresh_dataset.glob("convert/**/*.wav")), "miss path must not write caches"
    for r, g in zip(ref, got):
        assert r.shape == g.shape and r.dtype == g.dtype
        diff = np.abs(r - g)
        assert diff.max() <= (1.0 / 32768.0) + 1e-12
        assert (diff > 0).mean() < 0.01


def test_clip_loader_host_transport_bit_identical(fresh_dataset, tmp_path):
    """FADTK_TPU_CONVERT_TRANSPORT=host: cache-miss clips are bit-identical to
    the host convert-cache path (same resample_kaiser + float_to_int16 calls,
    no wav write) — no device-resample LSB wiggle, and no device dispatches
    in the convert stage at all."""
    from fadtk_tpu.models.vggish import VGGishModel

    model = VGGishModel()
    files = sorted(fresh_dataset.glob("*.wav"))
    ref = _host_loaded(model, files, tmp_path)
    loader = ClipLoader(model, workers=2, transport="host")
    got = list(loader.iter_clips(files))
    assert not list(fresh_dataset.glob("convert/**/*.wav")), "miss path must not write caches"
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_clip_loader_transport_env_and_validation(fresh_dataset, monkeypatch):
    from fadtk_tpu.models.vggish import VGGishModel

    monkeypatch.delenv("FADTK_TPU_CONVERT_TRANSPORT", raising=False)
    assert ClipLoader(VGGishModel()).transport == "host"  # measured default
    monkeypatch.setenv("FADTK_TPU_CONVERT_TRANSPORT", "device")
    assert ClipLoader(VGGishModel()).transport == "device"
    monkeypatch.setenv("FADTK_TPU_CONVERT_TRANSPORT", "gemm")
    with pytest.raises(ValueError):
        ClipLoader(VGGishModel())


def test_clip_loader_hit_is_bit_identical(fresh_dataset, tmp_path):
    """Once the convert cache exists, ClipLoader reads it — bit-for-bit the
    cached path."""
    import shutil

    from fadtk_tpu.models.vggish import VGGishModel

    d = tmp_path / "cached"
    shutil.copytree(fresh_dataset, d)
    model = VGGishModel()
    fad = FrechetAudioDistance(model, load_model=False)
    files = sorted(d.glob("*.wav"))
    ref = [np.asarray(fad.load_audio(f)) for f in files]  # builds the cache
    got = list(ClipLoader(model, workers=2).iter_clips(files))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_load_wav_array_overrides_match_load_wav(tmp_path):
    """Every load_wav override's in-memory twin produces identical output."""
    from fadtk_tpu.models.cdpam import CdpamModel
    from fadtk_tpu.models.encodec import EncodecEmbModel
    from fadtk_tpu.models.vggish import VGGishModel

    for model in [VGGishModel(), CdpamModel("acoustic"), EncodecEmbModel("48k")]:
        q = float_to_int16(_tone(model.sr, 1.2, 20))
        f = tmp_path / f"{model.name}.wav"
        write_wav_int16(f, q, model.sr)
        np.testing.assert_array_equal(model.load_wav(f), model.load_wav_array(q))


def test_device_pipeline_fresh_dataset(fresh_dataset, tmp_path, monkeypatch):
    """score_datasets_device on a never-cached dataset (in-memory convert all
    the way, DEVICE transport so the on-accelerator resample stays covered)
    matches the cached-embedding path within the pipeline's float32
    contract."""
    import shutil

    from fadtk_tpu.models.vggish import VGGishModel
    from fadtk_tpu.runner.device_pipeline import dataset_stats_device

    monkeypatch.setenv("FADTK_TPU_CONVERT_TRANSPORT", "device")
    model = VGGishModel()
    mu_d, cov_d, n_d = dataset_stats_device(model, fresh_dataset, batch=16)

    d = tmp_path / "hostref"
    shutil.copytree(fresh_dataset, d)
    fad = FrechetAudioDistance(model, load_model=True)
    for f in sorted(d.glob("*.wav")):
        fad.cache_embedding_file(f)
    mu_h, cov_h = fad.load_stats(d)

    np.testing.assert_allclose(mu_d, mu_h, atol=2e-3)
    np.testing.assert_allclose(cov_d, cov_h, atol=5e-3)
