"""Microsoft CLAP 2023 embedding model (`clap-2023`).

Parity target: reference fadtk/model_loader.py:463-522 — 44.1 kHz; 7 s chunks
with a 1 s hop, every chunk start kept and zero-padded to 7 s (:493-508; the
int16 round-trip is commented out upstream, :491, and the stray
default_collate call has no effect, :502); per chunk the msclap audio encoder:
HTSAT tower -> msclap Projection head -> 1024-d embedding (no L2
normalization; `model.clap.audio_encoder(chunk)[0]`, :510).

msclap's Projection differs from LAION's: with p1 = linear1(x),
out = layer_norm(p1 + dropout(linear2(gelu(p1)))).

Mel frontend (msclap HTSAT config_2023): fft 1024, hop 320, 64 slaney mels.
The fmin/fmax defaults below (50/14000) follow the msclap 2023 config; they are
recorded as conversion metadata so real checkpoints are self-describing.

fmin/fmax provenance (round-4 bounded search — verified-unavailable offline):
the msclap package (1.3.4, pinned by the reference's uv.lock:578-595) is not
installed and its sdist/wheel is in no cache on this machine (searched: pip
site-packages, ~/.cache/uv wheels-v5 + sdists-v9, /root/reference, the
retrieved PAPERS.md/SNIPPETS.md — zero hits for the feature-extractor config).
50/14000 are the values msclap's config yamls use for the HTSAT audio tower
(same as the CLAP 2022/2023 papers' mel settings); they remain a transcription
from memory of the public repo, NOT a file read from disk. When a checkpoint
or the package appears: weights/convert_cli.py stores these as metadata, so a
mismatch surfaces as a one-line metadata diff, and scripts/real_parity.sh is
the gate. Everything downstream (schema inventory incl. the bias-free
Projection linears, chunking, head math) is transcribed from real sources
(weights/schemas.py).
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import torchlibrosa_log_mel
from ..utils import log
from .base import EmbeddingModel
from .htsat import HTSATConfig, htsat_forward, init_htsat_params

_SR = 44100
_CHUNK = 7 * _SR
_HOP = _SR


class _MelParams(NamedTuple):
    n_fft: int = 1024
    hop: int = 320
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0


def msclap_projection(p, x: jax.Array) -> jax.Array:
    """msclap Projection: layer_norm(linear1(x) + linear2(gelu(linear1(x)))).

    Both linears are bias-free (nn.Linear(..., bias=False),
    msclap/models/clap.py Projection)."""
    p1 = x @ p["linear1"]["kernel"]
    p2 = jax.nn.gelu(p1, approximate=False) @ p["linear2"]["kernel"]
    y = p1 + p2
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + 1e-5) * p["layer_norm"]["scale"] + p["layer_norm"]["bias"]


def _forward(cfg: HTSATConfig, mel: _MelParams, params, chunks):
    """(B, 308700) -> (B, 1024)."""
    m = torchlibrosa_log_mel(
        chunks, sr=_SR, n_fft=mel.n_fft, hop=mel.hop, n_mels=mel.n_mels,
        fmin=mel.fmin, fmax=mel.fmax,
    )
    pooled = htsat_forward(cfg, params, m[:, None, :, :])
    return msclap_projection(params["projection"], pooled).astype(jnp.float32)


@lru_cache(maxsize=4)
def _jitted(cfg: HTSATConfig, mel: _MelParams):
    from functools import partial

    return jax.jit(partial(_forward, cfg, mel))


class MSCLAPModel(EmbeddingModel):
    def __init__(self, type: str = "2023"):
        assert type == "2023", "the reference registers only clap-2023"
        super().__init__(f"clap-{type}", 1024, _SR)
        self.type = type
        self.cfg = HTSATConfig(embed_dim=96)  # out_emb 768 == tiny geometry
        self.mel = _MelParams()
        self.params = None

    def weights_name(self) -> str:
        return "msclap_2023"

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
                fields = decode_config_meta(meta)
                mel_fields = {k: v for k, v in fields.items() if k in _MelParams._fields}
                cfg_fields = {k: v for k, v in fields.items() if k not in _MelParams._fields}
                self.mel = self.mel._replace(**mel_fields)
                self.cfg = replace(self.cfg, **cfg_fields)
            self.params = stored
        elif random_weights_enabled():
            log.warning(f"{self.name}: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)")
            params = init_htsat_params(self.cfg, jax.random.PRNGKey(0), projection_dim=None)
            key = jax.random.PRNGKey(1)
            k1, k2 = jax.random.split(key)
            d = self.cfg.num_features
            params["projection"] = {
                # Bias-free linears, mirroring the published Projection class.
                "linear1": {"kernel": jax.random.normal(k1, (d, 1024)) * 0.02},
                "linear2": {"kernel": jax.random.normal(k2, (1024, 1024)) * 0.02},
                "layer_norm": {"scale": jnp.ones((1024,)), "bias": jnp.zeros((1024,))},
            }
            self.params = params
        else:
            raise MissingWeightsError(self.weights_name(), "msclap CLAP_weights_2023.pth")
        self.loaded = True

    def _make_chunks(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        starts = list(range(0, audio.shape[0], _HOP))
        chunks = np.zeros((len(starts), _CHUNK), np.float32)
        for i, s in enumerate(starts):
            seg = audio[s : s + _CHUNK]
            chunks[i, : seg.shape[0]] = seg
        return chunks

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        chunks = self._make_chunks(audio)
        return np.asarray(_jitted(self.cfg, self.mel)(self.params, jnp.asarray(chunks)))

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file chunk batching (chunks are independent fixed windows)."""
        self.ensure_loaded()
        per_file = [self._make_chunks(np.asarray(c)) for c in clips]
        fwd = _jitted(self.cfg, self.mel)
        outs = self._batch_chunked(
            per_file, lambda g: fwd(self.params, jnp.asarray(g)), batch_size=32
        )
        return [o.astype(np.float16) for o in outs]

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: 7 s windows are independent."""
        from functools import partial

        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()
        return DpChunkSpec(
            forward=partial(_forward, self.cfg, self.mel),
            make_chunks=lambda c: (self._make_chunks(np.asarray(c)),),
            params=self.params,
            num_features=self.num_features,
            preferred_batch=32,
        )
