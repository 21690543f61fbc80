"""Model registry: every variant the reference registers (reference
fadtk/model_loader.py:676-701), built lazily.

Registry contents (~120 variants):
    clap-2023; clap-laion-audio, clap-laion-music; vggish;
    MERT-v1-95M[-1..11] (12 = default name); encodec-emb, encodec-emb-48k;
    w2v2-base[-1..11], w2v2-large[-1..23]; hubert-base[-..], hubert-large[-..];
    wavlm-base[-..], wavlm-base-plus[-..], wavlm-large[-..];
    whisper-{tiny,base,small,medium,large}; dac-44kHz; cdpam-acoustic/content.

The reference gates DAC and CDPAM behind importability of their pip packages
(fadtk/model_loader.py:696-699); here all models are self-contained Flax code, so
everything is always registered.
"""

from __future__ import annotations

from typing import Callable

from .base import EmbeddingModel


def _builders() -> list[Callable[[], EmbeddingModel]]:
    # Imports are local so that `import fadtk_tpu` stays light and models that
    # are mid-build don't break the registry.
    from .clap_ms import MSCLAPModel
    from .clap_laion import CLAPLaionModel
    from .vggish import VGGishModel
    from .mert import MERTModel
    from .encodec import EncodecEmbModel
    from .wav2vec2 import W2V2Model
    from .hubert import HuBERTModel
    from .wavlm import WavLMModel
    from .whisper import WhisperModel
    from .dac import DACModel
    from .cdpam import CdpamModel

    builders: list[Callable[[], EmbeddingModel]] = [
        lambda: MSCLAPModel("2023"),
        lambda: CLAPLaionModel("audio"),
        lambda: CLAPLaionModel("music"),
        lambda: VGGishModel(),
    ]
    builders += [lambda v=v: MERTModel(layer=v) for v in range(1, 13)]
    builders += [lambda: EncodecEmbModel("24k"), lambda: EncodecEmbModel("48k")]
    builders += [lambda v=v: W2V2Model("base", layer=v) for v in range(1, 13)]
    builders += [lambda v=v: W2V2Model("large", layer=v) for v in range(1, 25)]
    builders += [lambda v=v: HuBERTModel("base", layer=v) for v in range(1, 13)]
    builders += [lambda v=v: HuBERTModel("large", layer=v) for v in range(1, 25)]
    builders += [lambda v=v: WavLMModel("base", layer=v) for v in range(1, 13)]
    builders += [lambda v=v: WavLMModel("base-plus", layer=v) for v in range(1, 13)]
    builders += [lambda v=v: WavLMModel("large", layer=v) for v in range(1, 25)]
    builders += [
        lambda s=s: WhisperModel(s) for s in ("tiny", "small", "base", "medium", "large")
    ]
    builders += [
        lambda: DACModel(),
        lambda: CdpamModel("acoustic"),
        lambda: CdpamModel("content"),
    ]
    return builders


def get_all_models() -> list[EmbeddingModel]:
    """All registered model variants (parity: fadtk/model_loader.py:676-701)."""
    return [b() for b in _builders()]


def get_model(name: str) -> EmbeddingModel:
    """Look up a single model variant by registry name."""
    for b in _builders():
        m = b()
        if m.name == name:
            return m
    raise KeyError(f"Unknown model: {name}")
