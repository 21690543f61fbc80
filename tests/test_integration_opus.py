"""Integration tests on the reference's real opus fixtures (data, not code):
the complete load_audio -> embed -> cache -> stats -> score call stack
(SURVEY.md 3.1) with random weights, on genuinely compressed audio."""

import os
import shutil
from pathlib import Path

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

REF_SAMPLES = Path("/root/reference/fadtk/test/samples")

pytestmark = pytest.mark.skipif(
    not REF_SAMPLES.exists(), reason="reference fixtures not present"
)


@pytest.fixture()
def sample_dirs(tmp_path):
    """Two small datasets of real opus clips (copied so caches stay in tmp)."""
    files = sorted(REF_SAMPLES.glob("*.opus"))
    a = tmp_path / "setA"
    b = tmp_path / "setB"
    a.mkdir(), b.mkdir()
    for f in files[:3]:
        shutil.copy(f, a / f.name)
    for f in files[3:6]:
        shutil.copy(f, b / f.name)
    return a, b


def test_vggish_full_stack_on_opus(sample_dirs):
    from fadtk_tpu.audio.wavio import read_wav_int16
    from fadtk_tpu.models.vggish import VGGishModel
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    a, b = sample_dirs
    model = VGGishModel()
    fad = FrechetAudioDistance(model)

    for d in (a, b):
        for f in sorted(d.glob("*.opus")):
            fad.cache_embedding_file(f)

    # Converted wav cache: mono 16-bit at 16 kHz, ~10 s clips.
    wav_path = next((a / "convert" / "16000").glob("*.wav"))
    wav, sr = read_wav_int16(wav_path)
    assert sr == 16000 and wav.ndim == 1
    assert 8.0 < wav.shape[0] / sr < 12.0
    # Real audio, not silence (decode + resample kept signal energy).
    assert np.abs(wav.astype(np.float64) / 32768).max() > 0.05

    # VGGish: ~10 s -> 10 examples of 128 features.
    emb = np.load(next((a / "embeddings" / "vggish").glob("*.npy")))
    assert emb.shape[1] == 128 and 8 <= emb.shape[0] <= 11
    assert emb.dtype == np.float16

    score = fad.score(a, b)
    assert np.isfinite(score) and score > 0


def test_batched_cli_on_opus(sample_dirs, monkeypatch):
    import sys

    from fadtk_tpu.cli.main import main

    a, b = sample_dirs
    csv = a.parent / "out.csv"
    monkeypatch.setattr(
        sys, "argv", ["fadtk", "w2v2-base", str(a), str(b), str(csv), "-w", "2"]
    )
    main()
    assert csv.exists()
    row = csv.read_text().strip().split("\n")[1].split(",")
    assert row[0] == "w2v2-base" and float(row[3]) > 0
