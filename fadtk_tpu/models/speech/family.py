"""EmbeddingModel wrapper for the speech-transformer family.

Shared behavior across w2v2/HuBERT/WavLM/MERT variants (reference
fadtk/model_loader.py:525-633, 254-288):

- 6-minute truncation with a warning (fadtk/model_loader.py:549-551);
- run the full encoder once, tap one hidden-state layer (:556-557);
- per-utterance input normalization when the model's HF processor does it.

TPU specifics: audio is padded to a length bucket (multiple of 10 s) so XLA
compiles once per bucket; the encoder's exact masking guarantees the valid
frames equal an unpadded run (tests/test_speech_encoder.py::test_padding_exactness).

A single backbone forward yields *all* layers, so the runner can cache
embeddings for every per-layer variant of a family in one pass (the reference
re-runs the full model per layer variant).
"""

from __future__ import annotations

import json
from dataclasses import asdict, replace
from functools import lru_cache, partial

import jax
import numpy as np

from ...utils import log, next_multiple
from ..base import EmbeddingModel
from .config import SpeechEncoderConfig
from .encoder import init_speech_encoder_params, speech_encoder_forward

BUCKET_SECONDS = 10


@lru_cache(maxsize=64)
def _jitted_forward(cfg: SpeechEncoderConfig, taps: tuple | None = None):
    return jax.jit(partial(speech_encoder_forward, cfg, taps=taps))


class SpeechEmbeddingModel(EmbeddingModel):
    """Base for w2v2/hubert/wavlm/mert registry entries."""

    def __init__(
        self,
        name: str,
        num_features: int,
        sr: int,
        cfg: SpeechEncoderConfig,
        layer: int,
        hf_source: str,
        limit_minutes: int = 6,
    ):
        super().__init__(name, num_features, sr)
        self.cfg = cfg
        self.layer = layer
        self.hf_source = hf_source
        self.limit = limit_minutes * 60 * sr
        self.params = None

    # -- weights ------------------------------------------------------- #

    def weights_name(self) -> str:
        """Checkpoint file key: per-layer variants share one backbone file."""
        return self.hf_source.replace("/", "__")

    def load_model(self) -> None:
        from ...weights.store import (
            MissingWeightsError,
            load_params,
            params_path,
            random_weights_enabled,
        )

        path = params_path(self.weights_name())
        if path.exists():
            stored = load_params(path)
            meta = stored.pop("__config__", None)
            if meta is not None:
                # Conversion-time captured architecture/processor facts win
                # over our defaults (see weights/convert_cli.py).
                fields = json.loads(bytes(np.asarray(meta)).decode())
                self.cfg = replace(self.cfg, **fields)
            self.params = stored
        elif random_weights_enabled():
            log.warning(f"{self.name}: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)")
            self.params = init_speech_encoder_params(self.cfg, jax.random.PRNGKey(0))
        else:
            raise MissingWeightsError(self.weights_name(), f"HF id {self.hf_source}")
        self.loaded = True

    # -- embedding ----------------------------------------------------- #

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        if audio.shape[0] > self.limit:
            log.warning(
                f"Audio is too long ({audio.shape[0] / self.sr / 60:.2f} minutes > "
                f"{self.limit / self.sr / 60:.2f} minutes). Truncating."
            )
            audio = audio[: self.limit]

        n = audio.shape[0]
        bucket = next_multiple(max(n, 1), BUCKET_SECONDS * self.sr)
        padded = np.zeros(bucket, np.float32)
        padded[:n] = audio.astype(np.float32)

        states, mask = _jitted_forward(self.cfg, (self.layer,))(
            self.params, padded[None], np.asarray([n], np.int32)
        )
        n_frames = int(np.asarray(mask[0]).sum())
        return np.asarray(states[0, 0, :n_frames])

    def embed_all_layers(self, audio: np.ndarray) -> np.ndarray:
        """(num_layers + 1, n_frames, H) — one forward, every layer tap; used by
        the runner to serve all per-layer variants of a family at once."""
        self.ensure_loaded()
        if audio.shape[0] > self.limit:
            audio = audio[: self.limit]
        n = audio.shape[0]
        bucket = next_multiple(max(n, 1), BUCKET_SECONDS * self.sr)
        padded = np.zeros(bucket, np.float32)
        padded[:n] = audio.astype(np.float32)
        states, mask = _jitted_forward(self.cfg)(
            self.params, padded[None], np.asarray([n], np.int32)
        )
        n_frames = int(np.asarray(mask[0]).sum())
        return np.asarray(states[:, 0, :n_frames])
