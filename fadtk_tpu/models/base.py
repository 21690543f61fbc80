"""Base class for embedding models.

Contract parity with the reference's ``ModelLoader`` (reference
fadtk/model_loader.py:21-86): a model has a unique ``name``, an output feature
dimension, an input sample rate, an optional minimum length; it loads lazily, and
``get_embedding`` returns a float16 ``(n_frames, num_features)`` array for storage
(the float32 -> float16 downcast at fadtk/model_loader.py:47-48 is part of the
on-disk cache format and is preserved).

TPU-native departures from the reference:

- ``_embed`` receives host float32 PCM and is expected to run its compute as a
  jitted JAX function over **static shapes** (each model chunks/pads its input to
  a fixed window or a length bucket so XLA compiles once per bucket).
- Weights are JAX pytrees, converted from the upstream torch checkpoints by
  ``fadtk_tpu.weights`` and stored under the checkpoint directory
  (``FADTK_TPU_CHECKPOINTS`` env var, default ``~/.cache/fadtk_tpu``).
- Models also expose ``embed_batch`` for the sharded multi-clip pipeline.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from pathlib import Path

import numpy as np

from ..utils import PathLike, log


def checkpoint_dir() -> Path:
    return Path(
        os.environ.get("FADTK_TPU_CHECKPOINTS", Path.home() / ".cache" / "fadtk_tpu")
    )


def _ship_int16_if_exact(group: np.ndarray):
    """Return `group` as a device f32 array shipped over the link as int16,
    or None if the values are not exactly int16-representable.

    Chunked-family batches are usually 16-bit PCM scaled by 1/32768 (the
    convert-cache contract; CLAP even quantizes through int16 by reference
    semantics), so the transfer can ship at half the bytes — the tunneled
    bench link moves ~44 MB/s and the axon client retains RAM proportional
    to bytes shipped (CLAUDE.md). The rescale runs in a separate tiny jit so
    the family's forward executable is unchanged and results stay
    bit-identical (same scheme as the speech family —
    models/speech/family.py). Mel examples / normalized windows (vggish,
    DAC) fail the check and ship f32 unchanged.
    """
    if group.dtype not in (np.float32, np.float64):
        return None
    scaled = group * 32768.0
    if not (
        scaled.min(initial=0.0) >= -32768.0
        and scaled.max(initial=0.0) <= 32767.0
        and np.array_equal(scaled, np.rint(scaled))
    ):
        return None
    import jax
    import jax.numpy as jnp

    global _int16_rescale
    if _int16_rescale is None:
        _int16_rescale = jax.jit(
            lambda a: a.astype(jnp.float32) * (1.0 / 32768.0)
        )
    return _int16_rescale(scaled.astype(np.int16))


_int16_rescale = None


class EmbeddingModel(ABC):
    """One embedding model variant (one registry name)."""

    #: Families where the bf16 fast mode (FADTK_TPU_BF16 / --bf16) is a real
    #: win opt in; DAC pins False (bench-neutral, keep reference numerics).
    SUPPORTS_BF16 = True

    def __init__(self, name: str, num_features: int, sr: int, min_len: int = -1):
        self.name = name
        self.num_features = num_features
        self.sr = sr
        self.min_len = min_len
        self.loaded = False
        self._bf16_cast = False
        self._bf16_active: bool | None = None  # latched at first ensure_loaded

    # ------------------------------------------------------------------ #
    # Loading / precision
    # ------------------------------------------------------------------ #

    @abstractmethod
    def load_model(self) -> None:
        """Materialize parameters (converted checkpoint or random for tests)."""

    @property
    def bf16(self) -> bool:
        """Is the bf16 throughput mode active for this model (models/precision.py)?

        Latched at first ``ensure_loaded``: once params are cast (or loaded
        float32), flipping FADTK_TPU_BF16 cannot desynchronize the compute
        dtype from ``cache_name`` — a bf16 forward can never write under the
        float32 cache key or vice versa.
        """
        if self._bf16_active is not None:
            return self._bf16_active
        from .precision import bf16_enabled

        return self.SUPPORTS_BF16 and bf16_enabled()

    @property
    def cache_name(self) -> str:
        """Name keying embedding/stats caches. bf16-mode embeddings differ
        numerically from the float32 reference-parity ones, so they live under
        a distinct ``<name>-bf16`` cache and can never mix."""
        return f"{self.name}-bf16" if self.bf16 else self.name

    def ensure_loaded(self) -> None:
        if not self.loaded:
            self.load_model()
            self.loaded = True
        if self._bf16_active is None:
            self._bf16_active = self.bf16  # latch the mode with the params
        if self.bf16 and not self._bf16_cast and getattr(self, "params", None) is not None:
            from .precision import cast_params_bf16

            self.params = cast_params_bf16(self.params)
            self._bf16_cast = True
            log.info(f"{self.name}: bf16 throughput mode (params cast to bfloat16)")

    # ------------------------------------------------------------------ #
    # Audio input
    # ------------------------------------------------------------------ #

    def load_wav(self, wav_file: PathLike) -> np.ndarray:
        """Read a converted 16-bit PCM wav as float in [-1, 1).

        Parity: reference fadtk/model_loader.py:63-70 (int16 / 32768, then
        minimum-length zero padding).
        """
        from ..audio.wavio import read_wav_int16

        wav_data, _sr = read_wav_int16(wav_file)
        if wav_data.ndim == 2:  # (frames, channels) -> keep channel-major parity
            wav_data = wav_data.astype(np.float64)
        wav = wav_data / 32768.0
        return self.enforce_min_len(wav)

    def load_wav_array(self, wav_data: np.ndarray) -> np.ndarray:
        """In-memory twin of ``load_wav``: consume the int16 PCM that *would*
        have been written to the convert cache (same content, no filesystem).
        Used by the device pipeline's in-memory convert path
        (runner/convert.py). Overrides must mirror their ``load_wav``."""
        wav = np.asarray(wav_data, np.int16) / 32768.0
        return self.enforce_min_len(wav)

    def enforce_min_len(self, audio: np.ndarray) -> np.ndarray:
        """Zero-pad audio shorter than ``min_len`` seconds, with a warning.

        Parity: reference fadtk/model_loader.py:72-86.
        """
        if self.min_len < 0:
            return audio
        if audio.shape[0] < self.min_len * self.sr:
            log.warning(
                f"Audio is too short for {self.name}. The model requires a minimum "
                f"length of {self.min_len}s, audio is {audio.shape[0] / self.sr:.2f}s. "
                "Padding with zeros."
            )
            pad = int(np.ceil(self.min_len * self.sr - audio.shape[0]))
            audio = np.pad(audio, (0, pad))
        return audio

    # ------------------------------------------------------------------ #
    # Embedding
    # ------------------------------------------------------------------ #

    @abstractmethod
    def _embed(self, audio: np.ndarray) -> np.ndarray:
        """Embed one clip -> (n_frames, num_features), float32."""

    def get_embedding(self, audio: np.ndarray) -> np.ndarray:
        """Embed and downcast for storage (parity: fadtk/model_loader.py:40-50)."""
        self.ensure_loaded()
        embd = np.asarray(self._embed(audio))
        # bfloat16 outputs (bf16 fast mode) also store as float16 — the cache
        # format is reference-fixed (f16 npy).
        if embd.dtype == np.float32 or embd.dtype.name == "bfloat16":
            embd = embd.astype(np.float16)
        return embd

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Embed several clips; subclasses override with batched device code."""
        return [self.get_embedding(c) for c in clips]

    def dp_spec(self):
        """Plug into the generic dp-sharded chunk pipeline (parallel/dp.py).

        Families whose inference is a fixed-window chunk forward return a
        ``DpChunkSpec``; families that cannot share a static window shape
        (e.g. encodec-emb 24k runs whole files at exact length) return None
        and fall back to the host cached-embedding path.
        """
        return None

    def dp_whole_spec(self):
        """Plug into the whole-clip dp pipeline (parallel/dp.py) for families
        whose inference has no static window but IS per-clip independent at
        exact length (encodec-emb 24k). Default: not available."""
        return None

    @staticmethod
    def _batch_chunked(
        per_file_chunks: list[np.ndarray],
        forward,
        batch_size: int = 32,
    ) -> list[np.ndarray]:
        """Cross-file batching helper for fixed-window ("chunked") models.

        per_file_chunks: one (n_chunks_i, *chunk_shape) array per file — all
        chunk shapes equal. Chunks from all files concatenate into fixed-size
        device batches (the last batch pads with zeros and the padded rows are
        dropped), then split back per file. Chunk-level results are independent
        per sample, so batching is exact.
        """
        counts = [c.shape[0] for c in per_file_chunks]
        flat = np.concatenate(per_file_chunks, axis=0)
        total = flat.shape[0]
        if total == 0:
            return [c[:0] for c in per_file_chunks]
        outs = []
        try_int16 = True  # cleared after the first non-PCM group (homogeneous data)
        for start in range(0, total, batch_size):
            group = flat[start : start + batch_size]
            # Always pad to the full batch so every call reuses one executable.
            pad = batch_size - group.shape[0]
            if pad:
                group = np.concatenate(
                    [group, np.zeros((pad, *group.shape[1:]), group.dtype)]
                )
            if try_int16:
                shipped = _ship_int16_if_exact(group)
                if shipped is None:
                    try_int16 = False  # e.g. mel examples / normalized windows
                else:
                    group = shipped
            out = np.asarray(forward(group))
            outs.append(out[: out.shape[0] - pad] if pad else out)
        merged = np.concatenate(outs, axis=0)
        results, pos = [], 0
        for n in counts:
            results.append(merged[pos : pos + n])
            pos += n
        return results

    def __repr__(self) -> str:
        return f"<{type(self).__name__} {self.name} d={self.num_features} sr={self.sr}>"
