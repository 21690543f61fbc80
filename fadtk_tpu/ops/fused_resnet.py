"""Fused SEANet residual block (EnCodec) — a MEASURED DEAD END, kept as an
off-by-default experiment (FADTK_TPU_FUSED_RESNET=1).

The hypothesis: the EnCodec-24k stage ablation (scripts/encodec_stage_probe.py)
put the two early resnet blocks at 60% of the whole forward (f32 21.3 + 24.2
of 76.0 ms) with full-audio-rate tensors (B=64, C=32, T=240000) walked
through HBM once per op in the [elu -> conv k3 -> elu -> conv k1 -> shortcut
k1 -> add] chain; cheap re-lowerings all failed (PERF.md ledger: im2col
0.54x, tap-sum 0.19-0.76x, k=1-as-einsum 0.53x), so read x once, keep the
chain in VMEM, write once.

The measurement (scripts/fused_resnet_probe.py, v5e): whole-model f32
76.5 -> 119.4 ms — the kernel LOSES 0.64x. The post-mortem bound analysis
says the premise was wrong: the resnet is not HBM-bound but VPU+pass-count
bound. Per (C=32, Tt=12288) program: the three narrow tap dots + k=1 dots
cost ~480 MXU passes (~10 us at ~21 ns/pass — ceil(M/128)*ceil(K/128)*
ceil(N/128) passes regardless of fill), and the two elu applications cost
~6.5 us of VPU exp/select (~8 ops/element over 600k elements) — ~17 us of
compute against only ~3.8 us of DMA. XLA's chain pays the same VPU/MXU
work but overlaps it with the conv HBM traffic across ops, which a single
sequential Mosaic program cannot. Merging taps into one K=3C dot and the
two output dots into one K=C+C/2 dot bounds a tuned kernel at ~192 passes
~= 13 us/program ~= 16.6 ms/stage — at best 1.3x the XLA stage, ~1.1x the
model, not worth the fragility. Lesson for the ledger: "fewer HBM passes"
only wins when the op chain is traffic-bound; count VPU ops and MXU passes
BEFORE writing the kernel (the flash kernel won because (B,H,T,T) logits
genuinely dominated traffic AND compute was MXU-shaped).

Everything below works and is equivalence-tested (tests/test_fused_resnet.py,
CPU interpret): causal reflect boundary in-kernel, lane-chunk halo via a
second clamped BlockSpec on the same array, ragged-T edge masking.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def fused_resnet_enabled() -> bool:
    # Default OFF everywhere: the whole-model A/B measured 0.64x (see module
    # docstring). The knob keeps the experiment reproducible.
    env = os.environ.get("FADTK_TPU_FUSED_RESNET")
    if env is not None and env.strip():
        from ..models.precision import _TRUTHY

        return env.strip().lower() in _TRUTHY
    return False


def _elu(x):
    # Mosaic has no expm1 lowering; exp on the clamped negative branch is
    # overflow-safe and within ~1e-8 of expm1 for f32 activations.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _kernel(x_ref, xh_ref, w1_ref, b1_ref, w2_ref, b2_ref, wsc_ref, bsc_ref, o_ref):
    t = pl.program_id(1)
    dt = x_ref.dtype
    x = x_ref[0]  # (C, Tt)
    tt = x.shape[1]

    e_main = _elu(x)
    # Halo: elu of the previous chunk's last two columns; reflect at t == 0.
    # (elu runs on the full 128-lane chunk BEFORE slicing: a (C, 2)-shaped
    # bf16 compare lowers to a vector<8x128x2xbf16> cmpf that Mosaic rejects
    # on v5e — "Target does not support this comparison".)
    e_halo = _elu(xh_ref[0])[:, -2:]
    reflect = jnp.concatenate([e_main[:, 2:3], e_main[:, 1:2]], axis=1)
    left = jnp.where(t == 0, reflect, e_halo)
    e = jnp.concatenate([left, e_main], axis=1)  # (C, Tt + 2)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    w1 = w1_ref[:]  # (C/2, C, 3)
    h = dot(w1[:, :, 0], e[:, 0:tt])
    h = h + dot(w1[:, :, 1], e[:, 1 : tt + 1])
    h = h + dot(w1[:, :, 2], e[:, 2 : tt + 2])
    h = h.astype(dt) + b1_ref[:]  # (C/2, Tt) + (C/2, 1)

    e2 = _elu(h)
    z = dot(w2_ref[:], e2).astype(dt) + b2_ref[:]  # (C, Tt)
    sc = dot(wsc_ref[:], x).astype(dt) + bsc_ref[:]
    o_ref[0] = sc + z


def _tile_len(c: int) -> int:
    # ~1.5 MB per (C, Tt) f32 buffer; lane-multiple of 128.
    return max(512, (393216 // c) // 128 * 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_resnet_causal(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    wsc: jax.Array,
    bsc: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """x: (B, C, T); w1: (C/2, C, 3); w2: (C, C/2); wsc: (C, C); biases 1-D.

    Returns (B, C, T) — the fused causal-reflect SEANet residual block.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, c, t = x.shape
    ch = w1.shape[0]
    assert w1.shape == (ch, c, 3) and w2.shape == (c, ch) and wsc.shape == (c, c)
    tt = _tile_len(c)
    nt = pl.cdiv(t, tt)

    col = lambda v: v.reshape(-1, 1)

    grid = (b, nt)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti)),
            # the 128-lane chunk holding the previous tile's last columns
            pl.BlockSpec(
                (1, c, 128),
                lambda bi, ti: (bi, 0, jnp.maximum(ti * (tt // 128) - 1, 0)),
            ),
            pl.BlockSpec((ch, c, 3), lambda bi, ti: (0, 0, 0)),
            pl.BlockSpec((ch, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, ch), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, tt), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
        interpret=interpret,
    )(x, x, w1, col(b1), w2, col(b2), wsc, col(bsc))
