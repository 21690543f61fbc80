"""Converter <-> checkpoint schema coverage (round-1 VERDICT item 5).

Ground truths:

- DAC: the published descript-audio-codec encoder inventory, transcribed as a
  generator (weights/schemas.py) — independent of the test-local torch mirror
  the round-1 tests used;
- CLAP: the REAL HF transformers ClapModel key inventory, constructed offline
  from the installed library (laion/clap-htsat-unfused architecture).

Negative tests prove the dry-run actually detects drift: a renamed upstream
key, a dropped key, and a reshaped tensor each fail loudly.
"""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax

from fadtk_tpu.weights.dryrun import dry_run_convert, load_schema
from fadtk_tpu.weights.schemas import dac_44khz_encoder_schema, hf_clap_audio_schema


def test_dac_converter_covers_published_inventory():
    from fadtk_tpu.models.dac_impl import DAC_44K, init_dac_params
    from fadtk_tpu.weights.dac import convert_dac_encoder

    schema = dac_44khz_encoder_schema()
    assert len([k for k in schema if k.startswith("encoder.")]) == 119
    dry_run_convert(
        "dac-44kHz",
        schema,
        lambda sd: convert_dac_encoder(sd, DAC_44K),
        relevant=lambda k: k.startswith("encoder."),
        reference_params=init_dac_params(DAC_44K, jax.random.PRNGKey(0)),
    )


def test_clap_converter_covers_real_hf_inventory():
    from fadtk_tpu.models.htsat import HTSAT_TINY, init_htsat_params
    from fadtk_tpu.weights.clap import convert_clap_audio

    schema = hf_clap_audio_schema()

    def relevant(k):
        return (
            k.startswith(("audio_model.", "audio_projection."))
            and "spectrogram" not in k
            and "logmel" not in k
        )

    dry_run_convert(
        "clap-laion-audio",
        schema,
        lambda sd: convert_clap_audio(sd, HTSAT_TINY),
        relevant=relevant,
        reference_params=init_htsat_params(
            HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=512
        ),
    )


def test_dryrun_detects_missing_key():
    """A renamed/removed upstream key the converter needs -> loud failure."""
    from fadtk_tpu.models.dac_impl import DAC_44K
    from fadtk_tpu.weights.dac import convert_dac_encoder

    schema = dac_44khz_encoder_schema()
    del schema["encoder.block.0.weight_g"]
    with pytest.raises(ValueError, match="requested a key absent"):
        dry_run_convert(
            "dac-44kHz",
            schema,
            lambda sd: convert_dac_encoder(sd, DAC_44K),
            relevant=lambda k: k.startswith("encoder."),
        )


def test_dryrun_detects_dropped_key():
    """An upstream key the converter silently ignores -> loud failure."""
    from fadtk_tpu.models.dac_impl import DAC_44K
    from fadtk_tpu.weights.dac import convert_dac_encoder

    schema = dac_44khz_encoder_schema()
    schema["encoder.block.7.weight_g"] = (64, 1, 1)  # a layer we don't map
    with pytest.raises(ValueError, match="never read"):
        dry_run_convert(
            "dac-44kHz",
            schema,
            lambda sd: convert_dac_encoder(sd, DAC_44K),
            relevant=lambda k: k.startswith("encoder."),
        )


def test_dryrun_detects_shape_mismatch():
    """A reshaped upstream tensor -> converted pytree disagrees with init."""
    from fadtk_tpu.models.dac_impl import DAC_44K, init_dac_params
    from fadtk_tpu.weights.dac import convert_dac_encoder

    schema = dac_44khz_encoder_schema()
    # Internally consistent but wrong output width: conversion succeeds, the
    # init-shape comparison must catch it.
    schema["encoder.block.6.weight_g"] = (512, 1, 1)
    schema["encoder.block.6.weight_v"] = (512, 1024, 3)
    schema["encoder.block.6.bias"] = (512,)
    with pytest.raises(ValueError, match="disagrees with the model's init"):
        dry_run_convert(
            "dac-44kHz",
            schema,
            lambda sd: convert_dac_encoder(sd, DAC_44K),
            relevant=lambda k: k.startswith("encoder."),
            reference_params=init_dac_params(DAC_44K, jax.random.PRNGKey(0)),
        )


def test_cdpam_dryrun_roundtrip(tmp_path):
    """cdpam: --dump-schema-format json -> dry_run_model passes."""
    import json

    import torch
    import torch.nn as nn

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.ModuleList(
                [nn.Conv1d(1, 8, 3, 2, 1), nn.Conv1d(8, 16, 3, 2, 1)]
            )
            self.norms = nn.ModuleList([nn.BatchNorm1d(8), nn.BatchNorm1d(16)])
            self.fc_acoustic = nn.Linear(16, 12)
            self.fc_content = nn.Linear(16, 12)

    sd = {f"base_encoder.{k}": tuple(v.shape) for k, v in Enc().state_dict().items()}
    p = tmp_path / "cdpam_sd.json"
    p.write_text(json.dumps({k: list(v) for k, v in sd.items()}))

    from fadtk_tpu.weights.dryrun import dry_run_model

    dry_run_model("cdpam-acoustic", str(p))


def test_dump_schema_cli_format(tmp_path):
    """--dump-schema output loads back through load_schema."""
    import json

    import torch

    ck = {"state_dict": {"encoder.w": torch.zeros(3, 4)}}
    ckpt = tmp_path / "ck.pth"
    torch.save(ck, ckpt)

    from fadtk_tpu.weights.dryrun import dump_schema

    out = tmp_path / "sd.json"
    dump_schema(str(ckpt), str(out))
    schema = load_schema(out)
    assert schema == {"encoder.w": (3, 4)}


def test_dryrun_restores_random_weights_env(monkeypatch, tmp_path):
    """dry_run_model('clap-2023') builds its reference pytree under
    FADTK_TPU_RANDOM_WEIGHTS=1 but must restore the caller's value — leaving
    it set would flip the whole process into random-weights mode."""
    import fadtk_tpu.weights.dryrun as dr

    sd_path = tmp_path / "msclap_sd.json"
    import json

    monkeypatch.delenv("FADTK_TPU_RANDOM_WEIGHTS", raising=False)
    # An empty inventory is enough: the env set/restore happens while building
    # the reference pytree, before the key-coverage verdict.
    sd_path.write_text(json.dumps({}))

    # Instrument get_model to prove the env-setting block actually ran (the
    # test must not pass vacuously if dry_run_model fails before reaching it).
    import fadtk_tpu.models.registry as registry

    real_get_model = registry.get_model
    seen_env: list = []

    def spy(name):
        seen_env.append(os.environ.get("FADTK_TPU_RANDOM_WEIGHTS"))
        return real_get_model(name)

    monkeypatch.setattr(registry, "get_model", spy)

    try:
        dr.dry_run_model("clap-2023", str(sd_path))
    except BaseException as e:  # noqa: BLE001 - verdict not under test
        assert not isinstance(e, KeyboardInterrupt)
    assert "1" in seen_env, "the RANDOM_WEIGHTS block never ran — vacuous test"
    assert os.environ.get("FADTK_TPU_RANDOM_WEIGHTS") is None


def _htsat_relevant_laion(k):
    k = k.removeprefix("module.")
    return (
        k.startswith(("audio_branch.", "audio_projection.", "audio_model."))
        and "spectrogram_extractor" not in k
        and "logmel_extractor" not in k
        and ".tscam_conv." not in k
        and not k.startswith("audio_branch.head.")
    )


def test_laion_pt_converter_covers_published_inventory():
    """The ORIGINAL laion_clap .pt schema (module.audio_branch.* fused-qkv
    HTSAT + Sequential audio_projection), transcribed from the published
    laion_clap source — the checkpoints the reference actually downloads
    (fadtk/model_loader.py:300-310). Complements the HF-tree test above."""
    from fadtk_tpu.models.htsat import HTSAT_TINY, init_htsat_params
    from fadtk_tpu.weights.clap import convert_clap_audio
    from fadtk_tpu.weights.schemas import laion_clap_pt_schema

    dry_run_convert(
        "clap-laion-audio(.pt)",
        laion_clap_pt_schema("HTSAT-tiny"),
        lambda sd: convert_clap_audio(sd, HTSAT_TINY),
        relevant=_htsat_relevant_laion,
        reference_params=init_htsat_params(
            HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=512
        ),
    )


def test_laion_pt_base_geometry():
    """HTSAT-base (clap-laion-music) converts from the scaled inventory."""
    from fadtk_tpu.models.htsat import HTSAT_BASE, init_htsat_params
    from fadtk_tpu.weights.clap import convert_clap_audio
    from fadtk_tpu.weights.schemas import laion_clap_pt_schema

    dry_run_convert(
        "clap-laion-music(.pt)",
        laion_clap_pt_schema("HTSAT-base"),
        lambda sd: convert_clap_audio(sd, HTSAT_BASE),
        relevant=_htsat_relevant_laion,
        reference_params=init_htsat_params(
            HTSAT_BASE, jax.random.PRNGKey(0), projection_dim=512
        ),
    )


def test_msclap_converter_covers_published_inventory(monkeypatch):
    """clap-2023 against the transcribed msclap source schema (VERDICT r2 #5):
    audio_encoder.base.htsat.* tower + the BIAS-FREE Projection head."""
    from fadtk_tpu.models.clap_ms import MSCLAPModel
    from fadtk_tpu.weights.clap import convert_msclap_audio
    from fadtk_tpu.weights.schemas import msclap_2023_audio_schema

    monkeypatch.setenv("FADTK_TPU_RANDOM_WEIGHTS", "1")
    ref = MSCLAPModel()
    ref.load_model()

    def relevant(k):
        k = k.removeprefix("module.")
        return (
            k.startswith("audio_encoder.")
            and "spectrogram" not in k
            and "logmel_extractor" not in k
            and ".tscam_conv." not in k
            and ".htsat.head." not in k
        )

    dry_run_convert(
        "clap-2023",
        msclap_2023_audio_schema(),
        lambda sd: convert_msclap_audio(sd, ref.cfg),
        relevant=relevant,
        reference_params=ref.params,
    )


def test_msclap_projection_is_bias_free():
    """Guard the distinctive msclap detail: Projection linears carry no bias
    (nn.Linear(..., bias=False) in msclap/models/clap.py). A converter that
    assumes biases would KeyError on the real checkpoint."""
    from fadtk_tpu.weights.schemas import msclap_2023_audio_schema

    schema = msclap_2023_audio_schema()
    assert "audio_encoder.projection.linear1.weight" in schema
    assert "audio_encoder.projection.linear1.bias" not in schema
    assert "audio_encoder.projection.linear2.bias" not in schema
    assert "audio_encoder.projection.layer_norm.bias" in schema


def test_vggish_converter_covers_published_inventory():
    """vggish (torch.hub harritaylor/torchvggish) against the transcribed
    inventory (VERDICT r2 #9)."""
    from fadtk_tpu.models.vggish import init_vggish_params
    from fadtk_tpu.weights.schemas import vggish_schema
    from fadtk_tpu.weights.vggish import convert_vggish

    dry_run_convert(
        "vggish",
        vggish_schema(),
        lambda sd: convert_vggish(sd),
        relevant=lambda k: True,
        reference_params=init_vggish_params(jax.random.PRNGKey(0)),
    )
