"""Placeholder for the WavLMModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class WavLMModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("WavLMModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
