"""Descript Audio Codec encoder (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:189-251."""

from .base import EmbeddingModel


class DACModel(EmbeddingModel):
    def __init__(self):
        super().__init__('dac-44kHz', 1024, 44100)

    def load_model(self):
        raise NotImplementedError(
            "DACModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
