"""Placeholder for the WhisperModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class WhisperModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("WhisperModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
