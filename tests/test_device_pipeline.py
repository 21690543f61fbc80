"""Device-resident dataset scoring == the cached-embedding path (same float16
round-trip, same Gaussians) on single-device and on a (dp, tp) mesh."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
from fadtk_tpu.models.wav2vec2 import W2V2Model
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.runner.device_pipeline import dataset_stats_device
from fadtk_tpu.runner.fad import FrechetAudioDistance


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    sr = 16000
    for i in range(6):
        t = np.arange(int(sr * 1.5)) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)
    return d


@pytest.fixture(scope="module")
def w2v2():
    m = W2V2Model("base", layer=12)
    m.ensure_loaded()
    return m


def _host_stats(model, d):
    fad = FrechetAudioDistance(model, load_model=False)
    for f in sorted(d.glob("*.wav")):
        fad.cache_embedding_file(f)
    return fad.load_stats(d)


@pytest.mark.parametrize("dp,tp,batch", [(1, 1, 3), (4, 2, 8)])
def test_device_stats_match_cached_path(dataset, w2v2, dp, tp, batch):
    mu_ref, cov_ref = _host_stats(w2v2, dataset)
    mesh = make_mesh(dp * tp, tp=tp)
    mu, cov, n = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=batch)
    assert n == 6 * w2v2.cfg.num_output_frames(24000)
    # float32 on-device accumulation vs the cached path's float64 per-file
    # merge: identical frames, different summation order.
    np.testing.assert_allclose(mu, mu_ref, atol=1e-3)
    np.testing.assert_allclose(cov, cov_ref, atol=5e-3)
