"""CDPAM perceptual embeddings (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:421-460."""

from .base import EmbeddingModel


class CdpamModel(EmbeddingModel):
    def __init__(self, mode):
        assert mode in ('acoustic', 'content')
        super().__init__(f'cdpam-{mode}', 512, 22050)
        self.mode = mode

    def load_model(self):
        raise NotImplementedError(
            "CdpamModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
