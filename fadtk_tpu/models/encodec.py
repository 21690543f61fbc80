"""EnCodec embedding models.

Parity target: reference fadtk/model_loader.py:111-186 —

- `encodec-emb` (24 kHz): mono, whole-file single pass through the SEANet
  encoder (the model is unsegmented, :135-137);
- `encodec-emb-48k` (48 kHz): stereo (mono is duplicated by convert_audio,
  :170), non-overlapping 1 s segments (stride == segment_length, :139-152).

Both truncate at 3 minutes in load_wav (:172-174). Embeddings are the
continuous encoder latents (128 features), not quantized codes. The reference
sets a target bandwidth (:126-129) but that only configures the quantizer,
which the embedding path never touches.

TPU notes: the 48k segments are a natural static-shape batch (all full segments
share (2, 48000)); the 24k whole-file path runs at exact length so the
reflect-padding semantics match upstream bit-for-bit.
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log
from .base import EmbeddingModel
from .encodec_impl import (
    CONFIG_24K,
    CONFIG_48K,
    EncodecEncoderConfig,
    encodec_encode,
    init_encodec_params,
)


@lru_cache(maxsize=8)
def _jitted(cfg: EncodecEncoderConfig):
    return jax.jit(partial(encodec_encode, cfg))


class EncodecEmbModel(EmbeddingModel):
    def __init__(self, variant: str = "24k"):
        assert variant in ("24k", "48k")
        super().__init__(
            "encodec-emb" if variant == "24k" else f"encodec-emb-{variant}",
            128,
            sr=24000 if variant == "24k" else 48000,
        )
        self.variant = variant
        self.cfg = CONFIG_24K if variant == "24k" else CONFIG_48K
        self.segment_length = None if variant == "24k" else self.sr  # 1 s segments
        self.params = None

    def weights_name(self) -> str:
        return f"encodec_{self.variant}"

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
            self.params = init_encodec_params(self.cfg, jax.random.PRNGKey(0))
        else:
            raise MissingWeightsError(
                self.weights_name(), f"HF id facebook/encodec_{self.variant}hz"
            )
        self.loaded = True

    def load_wav(self, wav_file) -> np.ndarray:
        """Parity: fadtk/model_loader.py:165-176 — channel conversion (mono is
        duplicated for the stereo 48k model) and the 3-minute cut."""
        from ..audio.wavio import read_wav_int16

        data, _sr = read_wav_int16(wav_file)  # mono int16 from the convert cache
        wav = (data / 32768.0).astype(np.float32)
        if wav.ndim == 1:
            wav = wav[None, :]  # (1, T)
        if self.cfg.audio_channels == 2 and wav.shape[0] == 1:
            wav = np.repeat(wav, 2, axis=0)

        limit = 3 * 60 * self.sr
        if wav.shape[1] > limit:
            wav = wav[:, :limit]
        return wav  # (channels, T)

    def load_wav_array(self, wav_data: np.ndarray) -> np.ndarray:
        """In-memory twin of load_wav: /32768, channel duplication for the
        stereo 48k model, 3-minute cut."""
        wav = (np.asarray(wav_data, np.int16) / 32768.0).astype(np.float32)
        if wav.ndim == 1:
            wav = wav[None, :]
        if self.cfg.audio_channels == 2 and wav.shape[0] == 1:
            wav = np.repeat(wav, 2, axis=0)
        limit = 3 * 60 * self.sr
        if wav.shape[1] > limit:
            wav = wav[:, :limit]
        return wav

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file batching for the 24k whole-file path: clips of identical
        (channels, length) share one forward (music datasets are typically
        uniform-length). Exact-length processing is preserved — no padding, so
        the upstream reflect-padding semantics are untouched. The 48k segmented
        path already batches within a file."""
        if self.segment_length is not None:
            return super().embed_batch(clips)
        self.ensure_loaded()

        from collections import defaultdict

        prepared = []
        for clip in clips:
            c = np.asarray(clip, np.float32)
            if c.ndim == 1:
                c = c[None, :]
            prepared.append(c)

        groups: dict[tuple, list[int]] = defaultdict(list)
        for i, c in enumerate(prepared):
            groups[c.shape].append(i)

        fwd = _jitted(self.cfg)
        results: list[np.ndarray | None] = [None] * len(clips)
        # Bounded group batches: throughput saturates around 64 ten-second
        # clips on v5e (8.4k window-s/s vs 6k at 16) and full-rate activations
        # are ~30 MB/clip — an unbounded stack would OOM on large uniform
        # datasets.
        group_batch = 64
        for idxs in groups.values():
            for start in range(0, len(idxs), group_batch):
                part = idxs[start : start + group_batch]
                stacked = np.stack([prepared[i] for i in part])
                out = np.asarray(fwd(self.params, stacked)).astype(np.float16)
                for j, i in enumerate(part):
                    results[i] = out[j]
        return results  # type: ignore[return-value]

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        fwd = _jitted(self.cfg)

        if self.segment_length is None:
            out = fwd(self.params, jnp.asarray(audio[None]))  # (1, T', 128)
            return np.asarray(out[0])

        # 48k: non-overlapping 1 s segments; full segments batch together.
        seg = self.segment_length
        length = audio.shape[1]
        n_full = length // seg
        outs = []
        if n_full:
            stacked = audio[:, : n_full * seg].reshape(audio.shape[0], n_full, seg)
            stacked = np.moveaxis(stacked, 1, 0)  # (n_full, C, seg)
            outs.append(np.asarray(fwd(self.params, jnp.asarray(stacked))))
        rem = length - n_full * seg
        if rem:
            tail = audio[None, :, n_full * seg :]
            outs.append(np.asarray(fwd(self.params, jnp.asarray(tail))))
        frames = [o.reshape(-1, self.num_features) for o in outs]
        return np.concatenate(frames, axis=0)

    def dp_spec(self):
        """Mesh-sharded chunk pipeline — 48k variant only.

        The 48k model's full 1 s segments are a natural static batch; the
        ragged final segment must run at its EXACT length (zero-padding would
        change the reflect-pad conv values, reference
        fadtk/model_loader.py:139-152), so it is computed by the ``tail``
        callback outside the sharded path. The 24k variant embeds whole files
        at exact length — no static window exists — and returns None (host
        cached path).
        """
        if self.segment_length is None:
            return None
        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()
        seg = self.segment_length
        fwd = partial(encodec_encode, self.cfg)

        def mk(clip):
            audio = np.asarray(clip, np.float32)
            if audio.ndim == 1:
                audio = audio[None, :]
            n_full = audio.shape[1] // seg
            if not n_full:
                return (np.zeros((0, audio.shape[0], seg), np.float32),)
            stacked = audio[:, : n_full * seg].reshape(audio.shape[0], n_full, seg)
            return (np.ascontiguousarray(np.moveaxis(stacked, 1, 0)),)

        def tail(clip):
            audio = np.asarray(clip, np.float32)
            if audio.ndim == 1:
                audio = audio[None, :]
            rem = audio.shape[1] % seg
            if not rem:
                return None
            t = audio[None, :, audio.shape[1] - rem :]
            out = np.asarray(_jitted(self.cfg)(self.params, jnp.asarray(t)))
            return out.reshape(-1, self.num_features)

        return DpChunkSpec(
            forward=fwd,
            make_chunks=mk,
            params=self.params,
            num_features=self.num_features,
            tail=tail,
            preferred_batch=64,  # 1 s segments; throughput saturates ~64
        )

    def dp_whole_spec(self):
        """Mesh-sharded whole-clip pipeline — 24k variant.

        The 24k model embeds each file in one pass at its EXACT length
        (reference fadtk/model_loader.py:135-137; time padding would change the
        reflect-pad conv values), so the sharding unit is the clip: clips of
        identical length stack and shard over ``dp``, one executable per
        distinct length (uniform-length datasets compile once). The SEANet
        encoder + LSTM are per-sample independent, so weight-0 zero rows pad
        ragged dispatches without perturbing real rows.
        """
        if self.segment_length is not None:
            return None  # 48k has the chunked dp path above
        from ..parallel.dp import DpWholeClipSpec

        self.ensure_loaded()

        def prepare(clip):
            c = np.asarray(clip, np.float32)
            if c.ndim == 1:
                c = c[None, :]
            return c

        return DpWholeClipSpec(
            forward=partial(encodec_encode, self.cfg),
            prepare=prepare,
            params=self.params,
            num_features=self.num_features,
            # Bounded like embed_batch: saturates ~64 ten-second clips and
            # full-rate activations are ~30 MB/clip.
            preferred_batch=8,
        )
