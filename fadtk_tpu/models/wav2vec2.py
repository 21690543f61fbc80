"""Placeholder for the W2V2Model implementation (being built; see registry.py)."""
from .base import EmbeddingModel


class W2V2Model(EmbeddingModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("W2V2Model is not implemented yet")

    def load_model(self):
        raise NotImplementedError

    def _embed(self, audio):
        raise NotImplementedError
