"""Placeholder for the VGGishModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class VGGishModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("VGGishModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
