"""Golden regression harness tests: full flow with synthetic fixtures —
self-consistent golden passes (exit 0), perturbed golden fails (exit 2)."""

import os
import sys

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16


def _setup_fixture(tmp_path):
    """Synthetic samples dir + baseline npz + golden CSV computed with the
    pipeline itself (random weights)."""
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    samples = tmp_path / "samples"
    samples.mkdir()
    rng = np.random.default_rng(0)
    sr = 16000
    for i in range(3):
        t = np.arange(sr) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        write_wav_int16(samples / f"clip{i}.wav", float_to_int16(x), sr)

    # Baseline stats from a separate synthetic dir.
    base = tmp_path / "base"
    base.mkdir()
    for i in range(4):
        t = np.arange(sr) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        write_wav_int16(base / f"b{i}.wav", float_to_int16(x), sr)

    model = get_model("w2v2-base")
    fad = FrechetAudioDistance(model)
    for d in (samples, base):
        for f in sorted(d.glob("*.wav")):
            fad.cache_embedding_file(f)
    mu, cov = fad.load_stats(base)
    npz = tmp_path / "baseline.npz"
    np.savez(npz, **{"w2v2-base.mu": mu, "w2v2-base.cov": cov})

    # Golden = what the pipeline itself computes (so the test passes).
    per_song = {}
    for f in sorted(samples.glob("*.wav")):
        emb = fad.read_embedding_file(f)
        from fadtk_tpu.metric.stats import calc_embd_statistics
        from fadtk_tpu.metric.frechet import frechet_distance

        mu_e, cov_e = calc_embd_statistics(emb)
        per_song[f"samples/{f.stem}"] = frechet_distance(mu, cov, mu_e, cov_e)
    per_song["samples/all"] = fad.score(npz, samples)

    golden = tmp_path / "golden.csv"
    with open(golden, "w") as g:
        g.write("song_id,dataset,FAD_w2v2_base_fma_pop\n")
        for k, v in per_song.items():
            g.write(f"{k},test,{v}\n")
    return samples, npz, golden


def _run_harness(tmp_path, monkeypatch, samples, npz, golden, out_name):
    from fadtk_tpu.cli import test_harness

    out_dir = tmp_path / out_name
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk-test", "--samples", str(samples), "--golden", str(golden),
         "--baseline", str(npz), "--out-dir", str(out_dir),
         "--models", "w2v2-base"],
    )
    test_harness.main()


def test_harness_passes_on_consistent_golden(tmp_path, monkeypatch):
    samples, npz, golden = _setup_fixture(tmp_path)
    _run_harness(tmp_path, monkeypatch, samples, npz, golden, "scores1")
    comparison = (tmp_path / "comparison.csv").read_text()
    assert "w2v2_base" in comparison
    assert "True" in comparison


def test_harness_fails_on_perturbed_golden(tmp_path, monkeypatch):
    samples, npz, golden = _setup_fixture(tmp_path)
    rows = golden.read_text().strip().split("\n")
    header, data = rows[0], rows[1:]
    bad = [header]
    for r in data:
        parts = r.split(",")
        parts[-1] = str(float(parts[-1]) * 2.0 + 10.0)
        bad.append(",".join(parts))
    golden.write_text("\n".join(bad))

    with pytest.raises(SystemExit) as e:
        _run_harness(tmp_path, monkeypatch, samples, npz, golden, "scores2")
    assert e.value.code == 2


def test_reads_real_reference_golden_csv():
    """Parse the reference's actual golden CSV structure (data fixture)."""
    from pathlib import Path

    from fadtk_tpu.cli.test_harness import _read_golden

    golden = Path("/root/reference/fadtk/test/samples_FAD_scores.csv")
    if not golden.exists():
        pytest.skip("reference fixtures not present")

    models, data = _read_golden(golden)
    assert len(models) == 21
    assert "vggish" in models and "MERT_v1_95M_11" in models
    assert "clap_laion_audio" in models
    # Whole-set row present for every model column.
    assert abs(data["vggish"]["samples/all"] - 5.12190021819319) < 1e-9
    # 23 per-song rows + samples/all.
    assert len(data["vggish"]) == 24
