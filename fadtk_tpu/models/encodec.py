"""Placeholder for the EncodecEmbModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class EncodecEmbModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("EncodecEmbModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
