"""The package facade mirrors the reference's star-exported surface
(reference fadtk/__init__.py re-exports fad, fad_batch, model_loader, utils),
so reference-style imports keep working (MIGRATING.md)."""

import fadtk_tpu


REFERENCE_SURFACE = [
    # fad.py
    "FrechetAudioDistance",
    "FADInfResults",
    "calc_frechet_distance",
    "calc_embd_statistics",
    # fad_batch.py
    "cache_embedding_files",
    # model_loader.py
    "ModelLoader",
    "get_all_models",
    "VGGishModel",
    "EncodecEmbModel",
    "DACModel",
    "MERTModel",
    "CLAPLaionModel",
    "CdpamModel",
    "CLAPModel",
    "W2V2Model",
    "HuBERTModel",
    "WavLMModel",
    "WhisperModel",
    # utils.py
    "calculate_embd_statistics_online",
    "get_cache_embedding_path",
    "find_sox_formats",
]


def test_reference_surface_importable():
    missing = [n for n in REFERENCE_SURFACE if not hasattr(fadtk_tpu, n)]
    assert not missing, missing


def test_all_resolves():
    missing = [n for n in fadtk_tpu.__all__ if not hasattr(fadtk_tpu, n)]
    assert not missing, missing


def test_reference_aliases():
    # The reference's ABC / msclap class names bind to our implementations.
    assert fadtk_tpu.ModelLoader is fadtk_tpu.EmbeddingModel
    assert fadtk_tpu.CLAPModel is fadtk_tpu.MSCLAPModel
