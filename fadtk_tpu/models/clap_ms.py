"""Placeholder for the MSCLAPModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class MSCLAPModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("MSCLAPModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
