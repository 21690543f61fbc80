"""TPU Pallas kernels for hot model ops."""

from .flash_attention import flash_attention, flash_attention_enabled

__all__ = ["flash_attention", "flash_attention_enabled"]
