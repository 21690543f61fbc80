"""fadtk-tpu: a TPU-native Frechet Audio Distance framework.

Capability-parity rebuild of microsoft/fadtk (reference: /root/reference), designed
from scratch for JAX/XLA/Pallas on TPU:

- ``fadtk_tpu.metric``   — Gaussian statistics (streaming Welford/Chan, psum-sharded)
                           and the Frechet distance (eigh / Newton-Schulz sqrtm).
- ``fadtk_tpu.dsp``      — device-side DSP: Kaiser-sinc polyphase resampling (GEMM
                           formulation for the MXU), STFT/log-mel frontends.
- ``fadtk_tpu.audio``    — host-side decode (native libav C++ library) and WAV I/O.
- ``fadtk_tpu.models``   — from-scratch Flax embedding zoo (VGGish, Encodec, CLAP,
                           MERT/w2v2/HuBERT/WavLM, Whisper, DAC, CDPAM) + registry.
- ``fadtk_tpu.parallel`` — mesh/sharding helpers; sharded batch inference + stats.
- ``fadtk_tpu.runner``   — reference-compatible cache layout and the batched pipeline.
- ``fadtk_tpu.cli``      — `fadtk` / `fadtk-embeds` / `fadtk-package` CLI parity.

Public API mirrors the reference facade (reference fadtk/__init__.py:1-3).
"""

from .metric.frechet import frechet_distance, calc_frechet_distance
from .metric.stats import calc_embd_statistics, calculate_embd_statistics_online
from .runner.fad import FrechetAudioDistance, FADInfResults
from .models.registry import get_all_models
from .utils import get_cache_embedding_path

__version__ = "0.1.0"

__all__ = [
    "frechet_distance",
    "calc_frechet_distance",
    "calc_embd_statistics",
    "calculate_embd_statistics_online",
    "FrechetAudioDistance",
    "FADInfResults",
    "get_all_models",
    "get_cache_embedding_path",
    "__version__",
]
