"""LAION-CLAP (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:291-418."""

from .base import EmbeddingModel


class CLAPLaionModel(EmbeddingModel):
    def __init__(self, type):
        super().__init__(f'clap-laion-{type}', 512, 48000)
        self.type = type

    def load_model(self):
        raise NotImplementedError(
            "CLAPLaionModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
