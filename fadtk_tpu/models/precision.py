"""bf16 throughput mode.

The reference is float32-only (its models run whatever dtype the pip packages
ship). Here every model's compute dtype follows its *parameter* dtype, so
casting the loaded params to bfloat16 turns on the TPU fast path: matmuls and
convs execute as native-bf16 MXU passes, HBM traffic halves, attention takes
the fused flash kernel, and GELU takes the tanh approximation (see ``gelu``
below). Measured on TPU v5e (BENCH_FAMILIES.json, round 3): whisper-base
+116%, cdpam +78%, w2v2-base +35%, wavlm-base +67%, clap-laion +56%,
vggish +20%, encodec-emb +18% throughput vs float32.

This is an accuracy/throughput tradeoff and therefore strictly opt-in:

- env ``FADTK_TPU_BF16=1`` or the ``--bf16`` CLI flag;
- embeddings computed in bf16 differ slightly from the float32
  reference-parity values, so caches and stats segregate under
  ``<model>-bf16`` names (``EmbeddingModel.cache_name``) — a bf16 run can
  never silently contaminate a float32 cache or vice versa;
- scoring itself is unchanged (host float64 Frechet on the cached float16
  embeddings).

Every family supports the mode. DAC pinned ``SUPPORTS_BF16 = False``
through round 3 ("bf16 buys nothing, +0.1%") — that was XLA's f32 sin
dominating the forward either way; the Cody-Waite snake (ops/fastmath.py)
removed it and bf16 now buys +14%, so the pin is lifted.
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


def gelu(x):
    """GELU with a precision-mode-matched approximation policy.

    float32 (the parity path) keeps the exact erf form the HF models use
    (differential tests pin <=1e-4). bfloat16 — the opt-in throughput mode —
    uses the tanh approximation: a round-3 TPU decomposition measured exact
    erf at 52 ms of a 300 ms w2v2-base b=128 forward (17%! the conv
    frontend applies it to ~4e9 activation elements and the VPU pays ~10x
    per erf vs tanh), while tanh-GELU costs ~5 ms. The approximation's
    <=3e-4 absolute error is an order below bf16's own ~4e-3 rounding, so
    the bf16 contract ("slightly different embeddings, cache-segregated")
    is unchanged.

    The f32 form is composed by hand rather than via
    ``jax.nn.gelu(approximate=False)``: jax's exact branch computes
    ``erfc(-x*sqrt_half)`` — XLA:TPU's tail-accurate erfc does not fuse
    into the surrounding elementwise chain and pays an extra full HBM
    round-trip (isolated on 196M f32 elements: builtin 2.97 ms vs 1.50 ms
    composed, floor 1.10 — scripts/gelu_fusion_probe.py). The composed
    ``0.5*x*(1+erf(x*sqrt_half))`` is ALSO literally torch's exact-GELU
    formula (the HF models' reference math; jax's erfc form differs from
    it by f32 roundoff ~1e-6). Whole-model: w2v2-base f32 299.9 ->
    266.3 ms (+12.6%).
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))


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
