"""Float32-accurate polynomial transcendentals for VPU-bound activations.

Why this exists: XLA:TPU lowers `sin` conservatively (full-range reduction),
and DAC's snake activation calls it on every sample at 44.1 kHz between
every conv. The whole-model ablation (scripts/conv_family_ablation_probe.py)
measured snake at 55.7 of DAC's 86.0 ms/call — 65% of the family's time in
one elementwise op — and the variant probe (scripts/snake_norm_probe.py)
measured this polynomial at 32.9 ms whole-model (2.6x) with 1.26e-4 max
absolute deviation at the latent output (the torch-mirror differential
test's budget is 2e-4; the float16 embedding cache quantizes ~10x coarser).

`sin_cw` is the classic libm sinf construction: two-part Cody-Waite range
reduction (exact for |z| up to ~1e4 — snake arguments are alpha*x with
alpha ~ O(1) and pre-activation values O(10), far inside) followed by the
standard degree-9 odd minimax polynomial on [-pi/2, pi/2] (~2 ulp).
Accuracy is pinned against numpy in tests/test_fastmath.py.
"""

from __future__ import annotations

import jax.numpy as jnp

# 2*pi split so that k * _PI2_HI is exact in float32 for |k| < 2^12
# (high part carries 11 mantissa bits: 6.28125 = 402 / 64).
_PI2_HI = 6.28125
_PI2_LO = 1.9353071795864769e-3  # 2*pi - _PI2_HI
_INV_PI2 = 0.15915494309189535  # 1 / (2*pi)
_PI = 3.141592653589793
_PI_HALF = 1.5707963267948966


def sin_cw(z: jnp.ndarray) -> jnp.ndarray:
    """sin(z) to ~2 ulp float32 for |z| <~ 1e4, ~10-15 VPU ops.

    Cody-Waite: z - k*2pi in two exact steps, fold [-pi, pi] onto the
    principal branch with sin(z) = sin(pi - z), then the odd minimax
    polynomial. Arithmetic runs in float32 regardless of input dtype —
    the two-part reduction is meaningless at bf16 precision (k * PI2_HI
    would round away the correction the split exists to keep).
    """
    in_dtype = z.dtype
    if in_dtype != jnp.float32:
        z = z.astype(jnp.float32)
    k = jnp.round(z * _INV_PI2)
    r = z - k * _PI2_HI
    r = r - k * _PI2_LO
    r = jnp.where(r > _PI_HALF, _PI - r, r)
    r = jnp.where(r < -_PI_HALF, -_PI - r, r)
    r2 = r * r
    p = jnp.asarray(-2.3828544692960918e-8, z.dtype)
    p = p * r2 + 2.7521557770526783e-6
    p = p * r2 - 1.9840782426250314e-4
    p = p * r2 + 8.3333303183525942e-3
    p = p * r2 - 1.6666666601721269e-1
    out = r + r * r2 * p
    return out if in_dtype == jnp.float32 else out.astype(in_dtype)
