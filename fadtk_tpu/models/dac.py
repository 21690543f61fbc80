"""DAC embedding model (`dac-44kHz`).

Parity target: reference fadtk/model_loader.py:189-251 —

- audiotools preprocessing: loudness-normalize to -16 dB LUFS (:222),
  peak-limit to |x| <= 1 (:223), zero-pad to a multiple of the 5 s window
  (:228-229), collect 5 s windows with 50% overlap (:230);
- per window: DAC 44 kHz encoder -> (430, 1024) latents, concatenated (:236-244).

The reference gates this model on the `dac` pip package
(fadtk/model_loader.py:696-697); here it is always available.

TPU notes: all windows share one static (n_windows, 1, 220500) shape — a single
batched forward; the loudness meter runs on host (dsp/loudness.py).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.loudness import normalize_loudness
from ..utils import log
from .base import EmbeddingModel
from .dac_impl import DAC_44K, DACEncoderConfig, dac_encode, init_dac_params

_SR = 44100
_WIN = int((5.0 * _SR) // 4 * 4)  # 220500; reference :214-216
_HOP = _WIN // 2


@lru_cache(maxsize=4)
def _jitted(cfg: DACEncoderConfig):
    return jax.jit(partial(dac_encode, cfg))


class DACModel(EmbeddingModel):
    # DAC pinned SUPPORTS_BF16=False through round 3 because bf16 was
    # bench-neutral (464.5 vs 465.2 window-s/s) — but that was an artifact
    # of XLA's sin dominating the forward (65%, f32 VPU-bound either way).
    # With the Cody-Waite snake (ops/fastmath.py) the convs are the cost
    # again and bf16 buys +14% (1226 -> 1401 window-s/s), so DAC joins the
    # standard opt-in bf16 contract (cache-segregated '<model>-bf16';
    # sin_cw computes internally in f32 regardless of the compute dtype).

    def __init__(self):
        super().__init__("dac-44kHz", 1024, _SR)
        self.cfg = DAC_44K
        self.params = None

    def weights_name(self) -> str:
        return "dac_44khz"

    def load_model(self) -> None:
        from ..weights.store import (
            MissingWeightsError,
            load_params,
            params_path,
            random_weights_enabled,
        )

        path = params_path(self.weights_name())
        if path.exists():
            stored = load_params(path)
            stored.pop("__config__", None)
            self.params = stored
        elif random_weights_enabled():
            log.warning(f"{self.name}: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)")
            self.params = init_dac_params(self.cfg, jax.random.PRNGKey(0))
        else:
            raise MissingWeightsError(
                self.weights_name(), "descript-audio-codec weights_44khz.pth"
            )
        self.loaded = True

    def _make_windows(self, audio: np.ndarray) -> np.ndarray:
        """audiotools sanitization (reference :222-223) + 5 s / 50%-hop windows."""
        x = np.asarray(audio, np.float64).reshape(-1)
        x = normalize_loudness(x, self.sr, -16.0).astype(np.float64)
        peak = np.abs(x).max()
        if peak > 1.0:
            x = x / peak

        n_win_units = max(1, math.ceil(x.shape[0] / _WIN))
        padded = np.zeros(n_win_units * _WIN, np.float32)
        padded[: x.shape[0]] = x
        num_windows = (padded.shape[0] - _WIN) // _HOP + 1
        return np.stack(
            [padded[i * _HOP : i * _HOP + _WIN] for i in range(num_windows)]
        )[:, None, :]

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        windows = self._make_windows(audio)
        out = _jitted(self.cfg)(self.params, windows)  # (n, 430, 1024)
        return np.asarray(out).reshape(-1, self.num_features)

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file window batching (5 s windows are independent)."""
        self.ensure_loaded()
        per_file = [self._make_windows(np.asarray(c)) for c in clips]
        fwd = _jitted(self.cfg)
        outs = self._batch_chunked(
            per_file, lambda g: fwd(self.params, jnp.asarray(g)), batch_size=8
        )
        return [
            o.reshape(-1, self.num_features).astype(np.float16) for o in outs
        ]

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: 5 s windows are independent (the
        zero-padded final window is part of the reference semantics, so every
        window frame is a valid frame)."""
        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()
        return DpChunkSpec(
            forward=partial(dac_encode, self.cfg),
            make_chunks=lambda c: (self._make_windows(np.asarray(c)),),
            params=self.params,
            num_features=self.num_features,
            preferred_batch=8,  # 5 s windows are heavy (2.4 TF per 8)
        )
