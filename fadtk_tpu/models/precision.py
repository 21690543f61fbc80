"""bf16 throughput mode.

The reference is float32-only (its models run whatever dtype the pip packages
ship). Here every model's compute dtype follows its *parameter* dtype, so
casting the loaded params to bfloat16 turns on the TPU fast path: matmuls and
convs execute as native-bf16 MXU passes and HBM traffic halves. Measured on
TPU v5e (BENCH_FAMILIES.json): whisper-base +71%, cdpam +78%, vggish +20%,
encodec-emb +18%, clap-laion +15% throughput vs float32.

This is an accuracy/throughput tradeoff and therefore strictly opt-in:

- env ``FADTK_TPU_BF16=1`` or the ``--bf16`` CLI flag;
- embeddings computed in bf16 differ slightly from the float32
  reference-parity values, so caches and stats segregate under
  ``<model>-bf16`` names (``EmbeddingModel.cache_name``) — a bf16 run can
  never silently contaminate a float32 cache or vice versa;
- scoring itself is unchanged (host float64 Frechet on the cached float16
  embeddings).

Families keep float32 where bf16 buys nothing: DAC (bench: +0.1%, pure
conv-roofline) pins ``SUPPORTS_BF16 = False``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_TRUTHY = ("1", "true", "yes", "on")


def bf16_enabled() -> bool:
    """Is the global bf16 throughput mode requested (FADTK_TPU_BF16)?"""
    return os.environ.get("FADTK_TPU_BF16", "").strip().lower() in _TRUTHY


def cast_params_bf16(params):
    """Cast every float32 leaf to bfloat16 (ints, bools, f64 leaves untouched)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32
        else x,
        params,
    )


def param_dtype(params, default=jnp.float32):
    """Compute dtype of a param pytree: the first floating-point leaf's dtype.

    Trace-safe (dtypes are static under jit). Model forwards cast their
    activations to this so compute follows the stored parameter precision —
    identity when params are float32, the bf16 fast path when cast.
    """
    for leaf in jax.tree.leaves(params):
        d = getattr(leaf, "dtype", None)
        if d is not None and jnp.issubdtype(d, jnp.floating):
            return d
    return default
