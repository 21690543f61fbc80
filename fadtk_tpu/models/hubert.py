"""Placeholder for the HuBERTModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class HuBERTModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("HuBERTModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
