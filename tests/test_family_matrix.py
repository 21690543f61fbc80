"""Smoke matrix: every implemented model family embeds real opus audio through
the full load_audio -> embed -> cache -> stats path (random weights). Catches
family-specific preprocessing breakage on genuinely compressed audio."""

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

# (name, expected feature dim, min expected frames for a ~10 s clip)
FAMILIES = [
    ("vggish", 128, 8),
    ("encodec-emb", 128, 700),
    ("encodec-emb-48k", 128, 1400),
    ("whisper-tiny", 384, 2),
    ("w2v2-base-3", 768, 450),
    ("MERT-v1-95M-4", 768, 700),
    ("hubert-base", 768, 450),
    ("wavlm-base-plus", 768, 450),
    ("clap-laion-audio", 512, 9),
    ("clap-2023", 1024, 9),
    ("dac-44kHz", 1024, 800),
    ("cdpam-acoustic", 512, 9),
    ("cdpam-content", 512, 9),
]


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    d = tmp_path_factory.mktemp("matrix")
    for f in sorted(REF_SAMPLES.glob("*.opus"))[:2]:
        shutil.copy(f, d / f.name)
    return d


@pytest.mark.parametrize("name,dim,min_frames", FAMILIES)
def test_family_embeds_real_audio(clips, name, dim, min_frames):
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    model = get_model(name)
    fad = FrechetAudioDistance(model)
    files = sorted(clips.glob("*.opus"))
    for f in files:
        fad.cache_embedding_file(f)

    emb = fad.read_embedding_file(files[0])
    assert emb.dtype == np.float16
    assert emb.shape[1] == dim
    assert emb.shape[0] >= min_frames
    assert np.isfinite(emb.astype(np.float32)).all()

    mu, cov = fad.load_stats(clips)
    assert mu.shape == (dim,) and cov.shape == (dim, dim)
