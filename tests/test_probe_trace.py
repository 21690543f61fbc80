"""The perf probes monkeypatch internal symbols (enc._layer_norm, wh._ln,
ht._ln, jax.nn.softmax, enc.wavlm_attention); a rename silently breaks the
next round's measurements. LEDGER_TRACE_ONLY mode re-traces every ablation
variant without paying remote compiles — this test runs it on CPU so symbol
or shape rot fails the suite, not the probe run."""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_speech_frontend_floor_variants_trace(monkeypatch, tmp_path):
    monkeypatch.setenv("LEDGER_TRACE_ONLY", "1")
    monkeypatch.setenv("LEDGER_OUT_DIR", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["speech_frontend_floor_probe.py"])
    import speech_frontend_floor_probe

    speech_frontend_floor_probe.main()

    import json

    data = json.loads((tmp_path / "speech_frontend_floor_bf16.json").read_text())
    for fam in ("wavlm-base", "w2v2-base"):
        assert fam in data and data[fam]["bind"] in ("mxu", "hbm")
        # The analytic per-layer floor must agree with the jaxpr walker on
        # the padded-pass total (the walker is the ledger's source of truth).
        assert (
            abs(data[fam]["walker_padded_tflop"] - data[fam]["analytic_padded_tflop"])
            < 0.02 * data[fam]["walker_padded_tflop"]
        )


@pytest.mark.slow
def test_attention_ledger_variants_trace(monkeypatch, tmp_path):
    monkeypatch.setenv("LEDGER_TRACE_ONLY", "1")
    # keep the dummy-timing output away from the real measured bench cache
    monkeypatch.setenv("LEDGER_OUT_DIR", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["attention_ledger_probe.py", "bf16"])
    import attention_ledger_probe

    attention_ledger_probe.main()

    # The probe wrote dummy timings; make sure the artifact build ran for
    # all four families (the per-family incremental write).
    import json

    data = json.loads((tmp_path / "attention_ledger_bf16.json").read_text())
    for fam in ("clap-laion-audio", "clap-2023", "whisper-base", "wavlm-base"):
        assert fam in data and "tower_padded_tflop" in data[fam]
    assert data[fam]["tower_padded_tflop"] > 0
