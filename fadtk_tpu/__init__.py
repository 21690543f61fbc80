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
from .runner.batch import cache_embedding_files, cache_embedding_files_multi
from .models.base import EmbeddingModel
from .models.registry import get_all_models, get_model
from .models.cdpam import CdpamModel
from .models.clap_laion import CLAPLaionModel
from .models.clap_ms import MSCLAPModel
from .models.dac import DACModel
from .models.encodec import EncodecEmbModel
from .models.hubert import HuBERTModel
from .models.mert import MERTModel
from .models.vggish import VGGishModel
from .models.wav2vec2 import W2V2Model
from .models.wavlm import WavLMModel
from .models.whisper import WhisperModel
from .utils import PathLike, get_cache_embedding_path, find_sox_formats, log
from .fad import TORCHAUDIO_RESAMPLING, ffmpeg_path, sox_path, torchaudio_backend

# Reference-name compatibility (reference fadtk/__init__.py star-exports its
# whole surface): the reference's ABC is `ModelLoader` (model_loader.py:21)
# and its msclap wrapper is `CLAPModel` (model_loader.py:463).
ModelLoader = EmbeddingModel
CLAPModel = MSCLAPModel

__version__ = "0.1.0"

__all__ = [
    "frechet_distance",
    "calc_frechet_distance",
    "calc_embd_statistics",
    "calculate_embd_statistics_online",
    "FrechetAudioDistance",
    "FADInfResults",
    "cache_embedding_files",
    "cache_embedding_files_multi",
    "EmbeddingModel",
    "ModelLoader",
    "get_all_models",
    "get_model",
    "CdpamModel",
    "CLAPLaionModel",
    "MSCLAPModel",
    "CLAPModel",
    "DACModel",
    "EncodecEmbModel",
    "HuBERTModel",
    "MERTModel",
    "VGGishModel",
    "W2V2Model",
    "WavLMModel",
    "WhisperModel",
    "get_cache_embedding_path",
    "find_sox_formats",
    "PathLike",
    "log",
    "TORCHAUDIO_RESAMPLING",
    "sox_path",
    "ffmpeg_path",
    "torchaudio_backend",
    "__version__",
]
