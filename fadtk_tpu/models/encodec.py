"""Encodec encoder embeddings (metadata stub; implementation in progress). Parity target: reference fadtk/model_loader.py:111-186."""

from .base import EmbeddingModel


class EncodecEmbModel(EmbeddingModel):
    def __init__(self, variant='24k'):
        super().__init__('encodec-emb' if variant == '24k' else f'encodec-emb-{variant}', 128, 24000 if variant == '24k' else 48000)
        self.variant = variant

    def load_model(self):
        raise NotImplementedError(
            "EncodecEmbModel compute path is not implemented yet in fadtk-tpu"
        )

    def _embed(self, audio):
        raise NotImplementedError
