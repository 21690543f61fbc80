"""Placeholder for the MERTModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class MERTModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("MERTModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
