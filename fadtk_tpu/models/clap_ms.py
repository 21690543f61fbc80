"""Microsoft CLAP 2023 (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:463-522."""

from .base import EmbeddingModel


class MSCLAPModel(EmbeddingModel):
    def __init__(self, type='2023'):
        super().__init__(f'clap-{type}', 1024, 44100)
        self.type = type

    def load_model(self):
        raise NotImplementedError(
            "MSCLAPModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
