"""CDPAM perceptual embeddings (`cdpam-acoustic`, `cdpam-content`).

Parity target: reference fadtk/model_loader.py:421-460 — 22.05 kHz input,
1 s NON-overlapping chunks (the trailing partial chunk runs at its own
length, :438-441), the CDPAM base_encoder's acoustic or content head,
L2-normalized per chunk (:443-444), concatenated to (n_chunks, 512).

The reference's custom ``load_wav`` (:451-460) reads floats with librosa and
multiplies by 32768 — i.e. the network consumes raw int16-scale values, not
[-1, 1) floats (it also uses the removed ``np.float`` alias, a known upstream
wart, SURVEY.md §2.6). Here the converted cache wav is already int16, so
``load_wav`` simply skips the /32768 normalization.

Architecture provenance and the parity caveat live in cdpam_impl.py: the
encoder is a documented best-effort reconstruction (no cdpam package or
checkpoint exists offline); converting a real checkpoint adapts the stored
geometry via ``__config__`` metadata.

TPU notes: all 1 s chunks are independent batch elements; full chunks and the
ragged tail share one static (chunk_samples,)-bucket executable through
per-layer valid-length masking (padded batch == unpadded run, exactly).
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import PathLike, log
from .base import EmbeddingModel
from .cdpam_impl import DEFAULT_CONFIG, CdpamConfig, cdpam_forward, l2_normalize

_CHUNK_BATCH = 128  # static chunk-batch bucket (1 s chunks are tiny; the
# narrow-channel conv stack needs a deep batch to fill the MXU — bench-tuned)


@lru_cache(maxsize=4)
def _jitted(cfg: CdpamConfig, mode: str):
    def run(params, chunks, lengths):
        _, acoustic, content = cdpam_forward(cfg, params, chunks, lengths)
        return l2_normalize(acoustic if mode == "acoustic" else content)

    return jax.jit(run)


class CdpamModel(EmbeddingModel):
    def __init__(self, mode: str):
        assert mode in ("acoustic", "content"), "Mode must be 'acoustic' or 'content'"
        super().__init__(f"cdpam-{mode}", 512, 22050)
        self.mode = mode
        self.cfg = DEFAULT_CONFIG
        self.params = None

    def weights_name(self) -> str:
        # Both modes are heads on one shared base_encoder checkpoint.
        return "cdpam"

    def load_model(self) -> None:
        from ..weights.store import (
            MissingWeightsError,
            decode_config_meta,
            load_params,
            params_path,
            random_weights_enabled,
        )

        path = params_path(self.weights_name())
        if path.exists():
            stored = load_params(path)
            meta = stored.pop("__config__", None)
            if meta is not None:
                self.cfg = replace(self.cfg, **decode_config_meta(meta))
            self.params = stored
        elif random_weights_enabled():
            log.warning(
                f"{self.name}: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)"
            )
            from .cdpam_impl import init_cdpam_params

            self.params = init_cdpam_params(jax.random.PRNGKey(0), self.cfg)
        else:
            raise MissingWeightsError(
                self.weights_name(),
                "cdpam pip package checkpoint scratch_loss_*.pth "
                "(pranaymanocha/PerceptualAudio)",
            )
        self.loaded = True

    def load_wav(self, wav_file: PathLike) -> np.ndarray:
        """int16-scale float32, matching the reference's x*32768 round-trip
        (fadtk/model_loader.py:451-460: librosa float read, then x32768)."""
        from ..audio.wavio import read_wav_int16

        wav_data, _sr = read_wav_int16(wav_file)
        return wav_data.astype(np.float32)

    def load_wav_array(self, wav_data: np.ndarray) -> np.ndarray:
        """In-memory twin of load_wav: int16-scale float32."""
        return np.asarray(wav_data, np.int16).astype(np.float32)

    def _chunk(self, audio: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Split one clip into padded 1 s chunks + valid lengths.

        Chunk boundaries are the reference's range(0, len, sr) slices
        (fadtk/model_loader.py:438-441): non-overlapping, tail kept ragged.
        """
        size = self.cfg.chunk_samples
        n = -(-audio.shape[0] // size)
        chunks = np.zeros((n, size), np.float32)
        lengths = np.zeros((n,), np.int32)
        for j, i in enumerate(range(0, audio.shape[0], size)):
            c = audio[i : i + size]
            chunks[j, : c.shape[0]] = c
            lengths[j] = c.shape[0]
        return chunks, lengths

    def _forward_padded(self, chunks: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Run a (n, chunk) batch through a fixed-size device bucket."""
        fn = _jitted(self.cfg, self.mode)
        n = chunks.shape[0]
        outs = []
        for start in range(0, n, _CHUNK_BATCH):
            g = chunks[start : start + _CHUNK_BATCH]
            gl = lengths[start : start + _CHUNK_BATCH]
            pad = _CHUNK_BATCH - g.shape[0]
            if pad:
                g = np.concatenate([g, np.zeros((pad, g.shape[1]), g.dtype)])
                gl = np.concatenate([gl, np.ones((pad,), gl.dtype)])
            out = np.asarray(fn(self.params, jnp.asarray(g), jnp.asarray(gl)))
            outs.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(outs, axis=0)

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        chunks, lengths = self._chunk(audio)
        if chunks.shape[0] == 0:
            return np.zeros((0, self.num_features), np.float32)
        return self._forward_padded(chunks, lengths)

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file chunk batching (1 s chunks are independent)."""
        self.ensure_loaded()
        per_file = [self._chunk(c) for c in clips]
        counts = [c.shape[0] for c, _ in per_file]
        if sum(counts) == 0:
            return [np.zeros((0, self.num_features), np.float16) for _ in clips]
        all_chunks = np.concatenate([c for c, _ in per_file], axis=0)
        all_lengths = np.concatenate([l for _, l in per_file], axis=0)
        merged = self._forward_padded(all_chunks, all_lengths)
        outs, pos = [], 0
        for n in counts:
            outs.append(merged[pos : pos + n].astype(np.float16))
            pos += n
        return outs

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: 1 s chunks + valid lengths (the
        per-layer masking keeps ragged tails exact inside the static shape)."""
        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()

        def fwd(params, chunks, lengths):
            _, acoustic, content = cdpam_forward(self.cfg, params, chunks, lengths)
            return l2_normalize(acoustic if self.mode == "acoustic" else content)

        def mk(clip):
            chunks, lengths = self._chunk(np.asarray(clip, np.float32))
            return (chunks, lengths)

        return DpChunkSpec(
            forward=fwd,
            make_chunks=mk,
            params=self.params,
            num_features=self.num_features,
            preferred_batch=256,  # 1 s chunks, narrow channels; bench-tuned
        )
