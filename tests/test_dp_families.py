"""Generic dp-sharded chunk pipeline == host cached-embedding path, for the
non-speech families (VERDICT round-1 item 4: multi-chip coverage beyond
speech). Runs on the 8-virtual-CPU-device mesh from conftest."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
from fadtk_tpu.models.registry import get_model
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.runner.device_pipeline import dataset_stats_device
from fadtk_tpu.runner.fad import FrechetAudioDistance


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("dpds")
    rng = np.random.default_rng(3)
    sr = 16000
    # Ragged lengths on purpose: 2.3 s guarantees ragged encodec-48k tails and
    # ragged cdpam chunks; 1.1 s exercises the short-clip path.
    for i, sec in enumerate((2.3, 1.1, 2.0, 1.7)):
        t = np.arange(int(sr * sec)) / sr
        x = 0.4 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        x += 0.05 * rng.standard_normal(t.shape[0])
        write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)
    return d


def _host_stats(model, d):
    fad = FrechetAudioDistance(model, load_model=True)
    for f in sorted(d.glob("*.wav")):
        fad.cache_embedding_file(f)
    return fad.load_stats(d)


# Families with a generic dp path (speech + whisper TP covered elsewhere).
FAMILIES = ["vggish", "encodec-emb-48k", "clap-laion-audio", "clap-2023",
            "cdpam-acoustic", "dac-44kHz", "whisper-tiny"]


@pytest.mark.parametrize("name", FAMILIES)
def test_sharded_stats_match_cached_path(dataset, name):
    model = get_model(name)
    mu_ref, cov_ref = _host_stats(model, dataset)

    mesh = make_mesh(8, tp=1)
    mu, cov, n = dataset_stats_device(model, dataset, mesh=mesh, batch=8)

    assert n >= 2
    # Same float16-rounded frames; float32 on-device accumulation vs the host
    # float64 merge differs only in summation order.
    scale = max(np.abs(mu_ref).max(), 1e-6)
    np.testing.assert_allclose(mu, mu_ref, atol=2e-3 * scale, rtol=2e-3)
    # Covariance noise floor: f32 accumulation of f16-rounded frames leaves
    # ~eps_f32 * |frame|^2 absolute noise, which dominates when embeddings are
    # L2-normalized and near-collinear (random-weight CLAP: cov ~ 1e-6).
    cscale = max(np.abs(cov_ref).max(), 1e-6)
    floor = 4e-7 * max(scale, 1.0) ** 2
    np.testing.assert_allclose(cov, cov_ref, atol=4e-3 * cscale + floor, rtol=4e-3)


def test_sharded_equals_single_device(dataset):
    """8-device sharded result == 1-device result (same executable math, psum
    inserted by the partitioner)."""
    model = get_model("encodec-emb-48k")
    mu1, cov1, n1 = dataset_stats_device(model, dataset, mesh=make_mesh(1), batch=8)
    mu8, cov8, n8 = dataset_stats_device(model, dataset, mesh=make_mesh(8), batch=8)
    assert n1 == n8
    np.testing.assert_allclose(mu1, mu8, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cov1, cov8, rtol=1e-4, atol=1e-4)


def test_batch_size_invariance(dataset):
    """Chunk packing across files must not change the statistics (exact Chan
    merge across batch partials)."""
    model = get_model("cdpam-acoustic")
    mesh = make_mesh(4)
    mu_a, cov_a, n_a = dataset_stats_device(model, dataset, mesh=mesh, batch=4)
    mu_b, cov_b, n_b = dataset_stats_device(model, dataset, mesh=mesh, batch=12)
    assert n_a == n_b
    # Different packings change f32 accumulation order within batches.
    np.testing.assert_allclose(mu_a, mu_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cov_a, cov_b, rtol=1e-3, atol=1e-5)


def test_24k_encodec_whole_clip_dp_matches_cached_path(dataset):
    """encodec-emb (24k) shards WHOLE clips at exact length over dp — the
    reflect-pad conv semantics forbid time padding, so the clip is the
    sharding unit (equal-length groups, weight-0 row padding)."""
    model = get_model("encodec-emb")
    mu_ref, cov_ref = _host_stats(model, dataset)

    mu, cov, n = dataset_stats_device(model, dataset, mesh=make_mesh(8), batch=8)

    assert n >= 2
    scale = max(np.abs(mu_ref).max(), 1e-6)
    np.testing.assert_allclose(mu, mu_ref, atol=2e-3 * scale, rtol=2e-3)
    cscale = max(np.abs(cov_ref).max(), 1e-6)
    floor = 4e-7 * max(scale, 1.0) ** 2
    np.testing.assert_allclose(cov, cov_ref, atol=4e-3 * cscale + floor, rtol=4e-3)


def test_24k_encodec_dp_sharded_equals_single_device(dataset):
    model = get_model("encodec-emb")
    mu1, cov1, n1 = dataset_stats_device(model, dataset, mesh=make_mesh(1), batch=2)
    mu8, cov8, n8 = dataset_stats_device(model, dataset, mesh=make_mesh(8), batch=8)
    assert n1 == n8
    np.testing.assert_allclose(mu1, mu8, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cov1, cov8, rtol=1e-4, atol=1e-4)
