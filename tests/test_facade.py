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


def test_reference_submodule_paths():
    """The reference's SUBMODULE import paths also resolve (users do
    `from fadtk.fad import FrechetAudioDistance`, `from fadtk.model_loader
    import W2V2Model`, `from fadtk.fad_batch import cache_embedding_files`,
    `from fadtk.utils import calculate_embd_statistics_online`) — each shim
    re-exports the reference module's exact public names."""
    from fadtk_tpu.fad import (  # noqa: F401
        TORCHAUDIO_RESAMPLING,
        FADInfResults,
        FrechetAudioDistance,
        calc_embd_statistics,
        calc_frechet_distance,
        ffmpeg_path,
        log,
        sox_path,
        torchaudio_backend,
    )
    from fadtk_tpu.fad_batch import cache_embedding_files  # noqa: F401
    from fadtk_tpu.model_loader import (  # noqa: F401
        CLAPModel,
        ModelLoader,
        W2V2Model,
        get_all_models,
    )
    from fadtk_tpu.utils import calculate_embd_statistics_online  # noqa: F401

    assert TORCHAUDIO_RESAMPLING is True
    assert FrechetAudioDistance is fadtk_tpu.FrechetAudioDistance
    assert ModelLoader is fadtk_tpu.EmbeddingModel
    assert cache_embedding_files is fadtk_tpu.cache_embedding_files
    import fadtk_tpu.metric.stats as _stats

    assert calculate_embd_statistics_online is _stats.calculate_embd_statistics_online


def test_star_export_parity_with_reference():
    """Every public name the reference's `from fadtk import *` would export
    (top-level defs/classes + module constants of its four star-imported
    modules) exists on fadtk_tpu."""
    import ast
    from pathlib import Path

    ref = Path("/root/reference/fadtk")
    if not ref.is_dir():  # env without the reference checkout
        import pytest

        pytest.skip("reference tree not present")
    names = set()
    for f in ["fad.py", "fad_batch.py", "model_loader.py", "utils.py"]:
        for node in ast.parse((ref / f).read_text()).body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if not node.name.startswith("_"):
                    names.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and not t.id.startswith("_"):
                        names.add(t.id)
            elif isinstance(node, ast.AnnAssign):
                # `NAME: type = value` module constants count as public too
                # (round-4 advisor finding #4).
                if isinstance(node.target, ast.Name) and not node.target.id.startswith("_"):
                    names.add(node.target.id)
            elif isinstance(node, ast.ImportFrom):
                # Intra-package re-exports are deliberate API surface; the
                # reference's stdlib/third-party imports (`from abc import
                # ABC`, `import torch`, ...) are namespace pollution we don't
                # mirror (round-4 advisor finding #4).
                mod = node.module or ""
                if node.level > 0 or mod == "fadtk" or mod.startswith("fadtk."):
                    for alias in node.names:
                        name = alias.asname or alias.name
                        if not name.startswith("_") and name != "*":
                            names.add(name)
    missing = sorted(n for n in names if not hasattr(fadtk_tpu, n))
    assert not missing, missing
