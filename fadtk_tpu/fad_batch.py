"""Module-path parity with ``fadtk.fad_batch`` (reference fadtk/fad_batch.py).

The reference's one public name is ``cache_embedding_files``
(fad_batch.py:25); its spawn-process pool is replaced here by decode threads
overlapping batched static-shape device inference (``runner/batch.py`` — the
TPU-native dataflow), same signature and cache side effects.
"""

from .runner.batch import cache_embedding_files
from .utils import log

__all__ = ["cache_embedding_files", "log"]
