"""Shared utilities: cache path scheme and small helpers.

The on-disk cache layout is the inter-stage API of the reference and is reproduced
bit-for-bit (reference fadtk/utils.py:60-68, fadtk/fad.py:143-147,268-274):

    {dataset}/convert/{sr}/{name}.wav          resampled mono 16-bit PCM audio
    {dataset}/embeddings/{model}/{stem}.npy    float16 (n_frames, n_features)
    {dataset}/stats/{model}/mu.npy|cov.npy     dataset Gaussian statistics
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Union

PathLike = Union[str, Path]

log = logging.getLogger("fadtk_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(levelname)s fadtk_tpu] %(message)s"))
    log.addHandler(_h)
    log.setLevel(os.environ.get("FADTK_LOGLEVEL", "INFO"))


def configure_compile_cache() -> None:
    """Enable JAX's persistent compilation cache — repeated CLI invocations
    skip recompiling the per-model executables (XLA compiles are expensive on
    TPU). Default location: $FADTK_TPU_CHECKPOINTS/xla_cache (or
    ~/.cache/fadtk_tpu/xla_cache); override with FADTK_TPU_COMPILE_CACHE=<dir>
    or disable with FADTK_TPU_COMPILE_CACHE=0."""
    cache = os.environ.get("FADTK_TPU_COMPILE_CACHE")
    if cache in ("0", "off", "none"):
        return
    if not cache:
        base = os.environ.get(
            "FADTK_TPU_CHECKPOINTS", str(Path.home() / ".cache" / "fadtk_tpu")
        )
        cache = str(Path(base) / "xla_cache")
    import jax

    Path(cache).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log.debug(f"persistent XLA compile cache: {cache}")
    except Exception as e:  # older jax versions
        log.warning(f"could not enable compile cache: {e}")


configure_compile_cache()


def get_cache_embedding_path(model: str, audio_path: PathLike) -> Path:
    """Path of the cached embedding .npy for an audio file.

    Layout parity: reference fadtk/utils.py:60-68.
    """
    audio_path = Path(audio_path)
    return audio_path.parent / "embeddings" / model / audio_path.with_suffix(".npy").name


def get_convert_cache_path(sr: int, audio_path: PathLike) -> Path:
    """Path of the cached resampled wav for an audio file.

    Layout parity: reference fadtk/fad.py:143-144.
    """
    audio_path = Path(audio_path)
    return (audio_path.parent / "convert" / str(sr) / audio_path.name).with_suffix(".wav")


def get_stats_cache_dir(dataset_dir: PathLike, model: str) -> Path:
    """Directory of the cached (mu, cov) statistics for a dataset directory.

    Layout parity: reference fadtk/fad.py:268.
    """
    return Path(dataset_dir) / "stats" / model


def dataset_files(path: PathLike) -> list[Path]:
    """Audio files of a dataset directory: non-recursive ``*.*`` glob, like the
    reference (fadtk/fad.py:215, fadtk/fad_batch.py:32)."""
    return sorted(p for p in Path(path).glob("*.*") if p.is_file())


def next_multiple(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (static-shape padding helper)."""
    return ((x + m - 1) // m) * m


def find_sox_formats(sox_path: str = "sox") -> list[str]:
    """Compatibility shim for the reference utility (fadtk/utils.py:49-57).

    The reference probes SoX's supported formats for its legacy conversion
    path, which is dead code behind TORCHAUDIO_RESAMPLING=True
    (fadtk/fad.py:24,161-184). This framework decodes through the native libav
    library (fadtk_tpu/native) and never shells out, so the probe degrades to
    the reference's own failure behavior: an empty list.
    """
    return []
