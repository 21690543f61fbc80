"""Whisper (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:636-672."""

from .base import EmbeddingModel


class WhisperModel(EmbeddingModel):
    def __init__(self, size):
        dims = {'tiny': 384, 'base': 512, 'small': 768, 'medium': 1024, 'large': 1280}
        super().__init__(f'whisper-{size}', dims[size], 16000)
        self.size = size

    def load_model(self):
        raise NotImplementedError(
            "WhisperModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
