"""CDPAM perceptual embeddings (`cdpam-acoustic`, `cdpam-content`).

Parity target: reference fadtk/model_loader.py:421-460 — 22.05 kHz, 1 s
non-overlapping chunks, CDPAM base_encoder's acoustic or content head,
L2-normalized per chunk. The reference's custom load_wav scales float audio by
32768 (and uses the removed np.float alias, a known upstream wart,
SURVEY.md 2.6).

STATUS: NOT YET IMPLEMENTED. CDPAM's base encoder has no local ground-truth
implementation in this environment (the cdpam package and its checkpoints are
unavailable offline, and unlike the other model families there is no
transformers port to differential-test against). Rather than ship an
unverifiable reconstruction, this stub fails loudly. The reference itself
registers CDPAM only when its optional package is importable
(fadtk/model_loader.py:698-699).
"""

from .base import EmbeddingModel


class CdpamModel(EmbeddingModel):
    def __init__(self, mode):
        assert mode in ("acoustic", "content")
        super().__init__(f"cdpam-{mode}", 512, 22050)
        self.mode = mode

    def load_model(self):
        raise NotImplementedError(
            "cdpam is not implemented yet: no offline ground truth exists to "
            "verify a from-scratch port against (see module docstring)."
        )

    def _embed(self, audio):
        raise NotImplementedError
