"""Placeholder for the CdpamModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class CdpamModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("CdpamModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
