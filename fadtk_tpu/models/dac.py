"""Placeholder for the DACModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class DACModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("DACModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
