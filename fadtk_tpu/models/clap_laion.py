"""LAION-CLAP embedding models (`clap-laion-audio`, `clap-laion-music`).

Parity target: reference fadtk/model_loader.py:291-418 — 48 kHz; int16
quantization round-trip (:392-393,413-418); overlapping 10 s chunks with a 1 s
hop where *every* chunk start yields a chunk (tails zero-padded to 10 s, so a
10 s clip produces 10 embedding frames, :395-404); per chunk: HTSAT audio tower
(tiny for 'audio', base for 'music', :385) -> MLP projection -> L2 normalize
(laion_clap get_audio_embedding semantics, == HF ClapModel.get_audio_features).

Mel frontend: torchlibrosa log-mel (fft 1024, hop 480, 64 slaney mels,
50-14000 Hz) computed on device as GEMMs; chunks batch into a single static
(n_chunks, 480000) forward.

Checkpoints: the reference auto-downloads 630k-audioset-best.pt /
music_audioset_epoch_15_esc_90.14.pt (:300-310); `fadtk-convert` consumes those
same files (or the HF laion/clap-htsat-unfused tree) offline.
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import torchlibrosa_log_mel
from ..utils import log
from .base import EmbeddingModel
from .htsat import (
    HTSAT_BASE,
    HTSAT_TINY,
    HTSATConfig,
    clap_audio_projection,
    htsat_forward,
    init_htsat_params,
)

_SR = 48000
_CHUNK = 10 * _SR
_HOP = _SR
_MEL = dict(sr=_SR, n_fft=1024, hop=480, n_mels=64, fmin=50.0, fmax=14000.0)


def _forward(cfg: HTSATConfig, params, chunks):
    """(B, 480000) -> (B, proj_dim) normalized.

    The mel frontend always runs float32; the Swin tower + projection follow
    the parameter dtype (bf16 fast mode); the L2 normalization is float32.
    """
    mel = torchlibrosa_log_mel(chunks, **_MEL)  # (B, 1001, 64)
    pooled = htsat_forward(cfg, params, mel[:, None, :, :])
    proj = clap_audio_projection(params["audio_projection"], pooled)
    proj = proj.astype(jnp.float32)
    return proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)


@lru_cache(maxsize=8)
def _jitted(cfg: HTSATConfig):
    from functools import partial

    return jax.jit(partial(_forward, cfg))


class CLAPLaionModel(EmbeddingModel):
    def __init__(self, type: str):
        assert type in ("audio", "music")
        super().__init__(f"clap-laion-{type}", 512, _SR)
        self.type = type
        self.cfg = HTSAT_TINY if type == "audio" else HTSAT_BASE
        self.params = None

    def weights_name(self) -> str:
        return f"clap_laion_{self.type}"

    def load_model(self) -> None:
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
            self.params = init_htsat_params(self.cfg, jax.random.PRNGKey(0), projection_dim=512)
        else:
            ckpt = (
                "630k-audioset-best.pt"
                if self.type == "audio"
                else "music_audioset_epoch_15_esc_90.14.pt"
            )
            raise MissingWeightsError(self.weights_name(), f"laion_clap checkpoint {ckpt}")
        self.loaded = True

    @staticmethod
    def _quantize_roundtrip(x: np.ndarray) -> np.ndarray:
        """int16 round-trip (parity: fadtk/model_loader.py:392-393,413-418)."""
        q = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
        return (q / 32767.0).astype(np.float32)

    def _make_chunks(self, audio: np.ndarray) -> np.ndarray:
        """(n,) audio -> (n_chunks, 480000): quantization round-trip + the
        reference's every-hop-start chunking with zero-padded tails."""
        audio = np.asarray(audio, dtype=np.float64).reshape(1, -1)
        audio = self._quantize_roundtrip(audio)[0]
        starts = list(range(0, audio.shape[0], _HOP))
        chunks = np.zeros((len(starts), _CHUNK), np.float32)
        for i, s in enumerate(starts):
            seg = audio[s : s + _CHUNK]
            chunks[i, : seg.shape[0]] = seg
        return chunks

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        chunks = self._make_chunks(audio)
        return np.asarray(_jitted(self.cfg)(self.params, jnp.asarray(chunks)))

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file chunk batching (chunks are independent fixed windows)."""
        self.ensure_loaded()
        per_file = [self._make_chunks(np.asarray(c)) for c in clips]
        fwd = _jitted(self.cfg)
        outs = self._batch_chunked(
            per_file, lambda g: fwd(self.params, jnp.asarray(g)), batch_size=32
        )
        return [o.astype(np.float16) for o in outs]

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: 10 s windows are independent, so the
        chunk stream shards over dp with no cross-chunk state."""
        from functools import partial

        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()
        return DpChunkSpec(
            forward=partial(_forward, self.cfg),
            make_chunks=lambda c: (self._make_chunks(c),),
            params=self.params,
            num_features=self.num_features,
            preferred_batch=32,
        )
