"""Placeholder for the CLAPLaionModel implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class CLAPLaionModel(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("CLAPLaionModel is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
