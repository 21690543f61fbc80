"""`fadtk-embeds` / `python -m fadtk_tpu.cli.embeds` — precompute embeddings for
multiple models x multiple directories.

Parity with the reference (fadtk/embeds.py:5-27): `-m MODELS... -d DIRS...`,
optional -w/-s. (The reference's pyproject declares a broken console script for
this command, fadtk's pyproject.toml:34; both spellings work here.)

TPU addition: per-layer variants of one backbone (e.g. MERT-v1-95M-1..12) are
grouped and served from a single forward pass per file.
"""

from __future__ import annotations

from argparse import ArgumentParser
from collections import defaultdict
from pathlib import Path

import numpy as np

from ..models.registry import get_all_models
from ..models.speech.family import SpeechEmbeddingModel
from ..runner.batch import cache_embedding_files
from ..runner.fad import FrechetAudioDistance
from ..utils import dataset_files, get_cache_embedding_path, log


def _cache_speech_group(models: list[SpeechEmbeddingModel], d: str, workers: int) -> None:
    """One backbone forward per file serves every requested layer variant."""
    primary = models[0]
    files = dataset_files(d)
    todo = [
        f for f in files
        if any(not get_cache_embedding_path(m.name, f).exists() for m in models)
    ]
    if not todo:
        log.info("All files already have embeddings, skipping.")
        return
    primary.ensure_loaded()
    fad = FrechetAudioDistance(primary, audio_load_worker=workers, load_model=False)
    for f in todo:
        wav = fad.load_audio(f)
        all_layers = primary.embed_all_layers(np.asarray(wav))
        for m in models:
            cache = get_cache_embedding_path(m.name, f)
            if cache.exists():
                continue
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.save(cache, all_layers[m.layer].astype(np.float16))


def main() -> None:
    models = {m.name: m for m in get_all_models()}

    ap = ArgumentParser(prog="fadtk-embeds")
    ap.add_argument("-m", "--models", type=str, choices=list(models.keys()),
                    nargs="+", required=True)
    ap.add_argument("-d", "--dirs", type=str, nargs="+", required=True)
    ap.add_argument("-w", "--workers", type=int, default=8)
    ap.add_argument("-s", "--sox-path", type=str, default="/usr/bin/sox",
                    help="(accepted for reference compatibility; unused)")
    args = ap.parse_args()

    # Group per-layer variants that share a backbone.
    groups: dict[str, list] = defaultdict(list)
    singles = []
    for name in args.models:
        m = models[name]
        if isinstance(m, SpeechEmbeddingModel):
            groups[m.weights_name()].append(m)
        else:
            singles.append(m)

    for d in args.dirs:
        for group in groups.values():
            names = ", ".join(m.name for m in group)
            log.info(f"Caching embeddings for {d} using {names} (shared backbone)")
            _cache_speech_group(group, d, args.workers)
        for m in singles:
            log.info(f"Caching embeddings for {d} using {m.name}")
            cache_embedding_files(d, m, workers=args.workers)


if __name__ == "__main__":
    main()
