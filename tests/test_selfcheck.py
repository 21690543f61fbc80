"""Self-check golden gate: with deterministic random weights, the pipeline must
reproduce the committed selfcheck scores (mad% < 5) — the numerical regression
net for refactors between rounds (see scripts/make_selfcheck_golden.py)."""

import os
import shutil
import sys
from pathlib import Path

import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

REPO = Path(__file__).parent.parent
SELFCHECK = REPO / "selfcheck"
REF_SAMPLES = Path("/root/reference/fadtk/test/samples")

pytestmark = pytest.mark.skipif(
    not (SELFCHECK / "golden.csv").exists() or not REF_SAMPLES.exists(),
    reason="selfcheck fixtures or reference samples not present",
)


def test_selfcheck_harness_passes(tmp_path, monkeypatch):
    from fadtk_tpu.cli import test_harness

    # Fresh caches: copy the clips so nothing stale leaks in.
    samples = tmp_path / "samples"
    samples.mkdir()
    for f in sorted(REF_SAMPLES.glob("*.opus")):
        shutil.copy(f, samples / f.name)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["fadtk-test",
         "--samples", str(samples),
         "--golden", str(SELFCHECK / "golden.csv"),
         "--baseline", str(SELFCHECK / "baseline.npz"),
         "--out-dir", str(tmp_path / "scores"),
         # Two cheap families keep the gate fast; the generator covers all 11.
         "--models", "w2v2-base", "encodec-emb-48k"],
    )
    test_harness.main()  # exit code 2 would raise SystemExit -> test failure

    comparison = (tmp_path / "comparison.csv").read_text()
    assert "w2v2_base" in comparison and "encodec_emb_48k" in comparison
    assert "False" not in comparison  # every compared model passed
