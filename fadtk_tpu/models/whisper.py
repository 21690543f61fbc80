"""Whisper embedding models.

Parity target: reference fadtk/model_loader.py:636-672 — `whisper-{tiny,base,
small,medium,large}` at 16 kHz. The reference runs the HF feature extractor
(one fixed 30 s window: pad or truncate) and a full seq2seq forward with two
forced decoder-start tokens, taking the decoder last_hidden_state — exactly 2
embedding frames per clip. That quirk is reproduced faithfully (SURVEY.md 2.3).
"""

from __future__ import annotations

from functools import lru_cache, partial

from .speech.encoder import scan_layers_enabled as _scan_flag

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import WHISPER_SAMPLES, whisper_log_mel
from ..utils import log
from .base import EmbeddingModel
from .whisper_impl import (
    WhisperConfig,
    config_for_size,
    init_whisper_params,
    whisper_forward,
)


@lru_cache(maxsize=16)  # 5 sizes x 2 scan modes must all stay resident
def _jitted(cfg: WhisperConfig, scan: bool = False):
    # `scan` keys the cache so a FADTK_TPU_SCAN_LAYERS flip mid-process
    # cannot reuse an executable traced under the other mode (the forward
    # reads the flag at trace time).
    return jax.jit(partial(whisper_forward, cfg))


class WhisperModel(EmbeddingModel):
    def __init__(self, size: str):
        dims = {"tiny": 384, "base": 512, "small": 768, "medium": 1024, "large": 1280}
        assert size in dims, f"unknown whisper size {size}"
        super().__init__(f"whisper-{size}", dims[size], 16000)
        self.size = size
        self.cfg = config_for_size(size)
        self.hf_source = f"openai/whisper-{size}"
        self.params = None

    def weights_name(self) -> str:
        return self.hf_source.replace("/", "__")

    def load_model(self) -> None:
        from dataclasses import replace

        from ..weights.store import (
            MissingWeightsError,
            load_params,
            params_path,
            random_weights_enabled,
        )

        path = params_path(self.weights_name())
        if path.exists():
            from ..weights.store import decode_config_meta

            stored = load_params(path)
            meta = stored.pop("__config__", None)
            if meta is not None:
                self.cfg = replace(self.cfg, **decode_config_meta(meta))
            self.params = stored
        elif random_weights_enabled():
            log.warning(f"{self.name}: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)")
            self.params = init_whisper_params(self.cfg, jax.random.PRNGKey(0))
        else:
            raise MissingWeightsError(self.weights_name(), f"HF id {self.hf_source}")
        self.loaded = True

    def _make_chunks(self, audio: np.ndarray) -> np.ndarray:
        """One fixed 30 s window per clip (HF extractor pads/truncates)."""
        clip = np.zeros((1, WHISPER_SAMPLES), np.float32)
        n = min(audio.shape[0], WHISPER_SAMPLES)
        clip[0, :n] = audio[:n].astype(np.float32)
        return clip

    def _forward_clips(self, clips: np.ndarray) -> np.ndarray:
        features = whisper_log_mel(jnp.asarray(clips))  # (B, 80, 3000)
        return _jitted(self.cfg, _scan_flag())(self.params, features)  # (B, 2, d)

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        return np.asarray(self._forward_clips(self._make_chunks(audio))[0])

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file batching: each clip is one static 30 s window."""
        self.ensure_loaded()
        per_file = [self._make_chunks(np.asarray(c)) for c in clips]
        outs = self._batch_chunked(per_file, self._forward_clips, batch_size=16)
        return [o.reshape(2, -1).astype(np.float16) for o in outs]

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: one fixed 30 s window per clip; the
        mel frontend fuses into the sharded forward."""
        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()
        cfg = self.cfg

        def fwd(params, clips):
            return whisper_forward(cfg, params, whisper_log_mel(clips))

        return DpChunkSpec(
            forward=fwd,
            make_chunks=lambda c: (self._make_chunks(np.asarray(c)),),
            params=self.params,
            num_features=self.num_features,
        )
