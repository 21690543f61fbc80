"""VGGish (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:89-108."""

from .base import EmbeddingModel


class VGGishModel(EmbeddingModel):
    def __init__(self):
        super().__init__('vggish', 128, 16000, min_len=1)

    def load_model(self):
        raise NotImplementedError(
            "VGGishModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
