"""1-D convolution lowering for the conv families (EnCodec, DAC, CDPAM).

Replaces raw `lax.conv_general_dilated` at every 1-D conv call site so the
lowering is selectable: ``FADTK_TPU_CONV_LOWERING`` = ``conv`` (default, the
XLA builtin) | ``gemm`` (explicit im2col framing + one einsum GEMM).

Why the escape hatch exists: XLA's TPU conv path can be *pathological to
compile* at audio shapes — round 3 measured the 44.1k->16k resample conv
(stride 441, 1256 taps) hanging the remote compiler for minutes, and the
isolated-layer probe (scripts/conv_gemm_experiment.py) reproduced outright
compile hangs on the cin=1 input convs of both EnCodec and DAC and on
enc24.down1. If a model-level compile ever hangs, ``gemm`` is the rescue.

Why ``conv`` stays the default — a measured dead end worth recording
(round-3 whole-model A/B, .bench_cache/families_convbaseline_r3.json vs
families_convauto.json vs families_tapsum_gemm.json):

- The **isolated-layer** probe (.bench_cache/conv_gemm_experiment.json)
  said framed GEMM wins 1.7-1.9x on every stride-1 layer. The **whole-model**
  A/B said the opposite: im2col-GEMM runs EnCodec at 0.54-0.57x and DAC at
  0.82x of the XLA-conv build. Isolated conv calls pay operand layout
  conversions that vanish in-model, where XLA fuses conv chains and picks
  layouts globally; meanwhile the im2col patch stack materializes a k-fold
  copy of the activation in HBM that the fused conv never writes.
- A tap-sum variant (y = sum_j shift(x, j*d) @ W_j, no patch tensor) lost
  even harder (0.19-0.76x): k separate GEMM dispatches defeat fusion
  entirely.
- Only cdpam f32 favored im2col (+14%); its bf16 throughput mode did not
  (-2%). Not worth a per-dtype special case on the already-fastest family.

Within the ``gemm`` lowering, stride>1 framing uses the shifted-reshape
trick proven in dsp/resample.py (each tap offset j*dilation = q*stride+r is
a static contiguous slice of a (frames, stride) reshape): the naive
``[::stride]`` im2col measured 4.7x slower on dac.down1 and compiled
pathologically on enc24.down2.

`conv1d_ncl` computes VALID cross-correlation exactly like
`lax.conv_general_dilated(..., "NCH", "OIH", "NCH")`: identical dot
products, different accumulation order (~1e-6 relative); equivalence is
pinned over every call-site shape class in tests/test_conv1d.py.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp


@lru_cache(maxsize=1)
def _lowering_default() -> str:
    v = os.environ.get("FADTK_TPU_CONV_LOWERING", "conv").strip().lower()
    return v if v in ("gemm", "conv") else "conv"


def conv1d_ncl(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    dilation: int = 1,
    lowering: str | None = None,
) -> jax.Array:
    """(B, Cin, T) x (Cout, Cin, K) -> (B, Cout, T_out), VALID padding.

    Callers apply their own padding semantics (causal/reflect/same) before
    the call, exactly as with the lax conv they replace.
    """
    if (lowering or _lowering_default()) == "conv":
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding="VALID",
            rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=x.dtype,
        )

    b, cin, t = x.shape
    cout, _, k = w.shape
    span = (k - 1) * dilation + 1
    n_out = (t - span) // stride + 1
    taps = _tap_views(x, k, stride, dilation, n_out, time_axis=2)
    patches = jnp.stack(taps, axis=2)  # (B, Cin, K, n_out)
    return jnp.einsum(
        "bckt,ock->bot", patches, w, preferred_element_type=x.dtype
    )


def conv1d_nlc(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    lowering: str | None = None,
) -> jax.Array:
    """(B, T, Cin) x (K, Cin, Cout) -> (B, T_out, Cout), VALID padding.

    Channel-last twin for the CDPAM stack (torch Conv1d weights arrive as
    (K, Cin, Cout) there) — framed without any transpose/relayout.
    """
    if (lowering or _lowering_default()) == "conv":
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )

    b, t, cin = x.shape
    k, _, cout = w.shape
    n_out = (t - k) // stride + 1
    taps = _tap_views(x, k, stride, 1, n_out, time_axis=1)
    patches = jnp.stack(taps, axis=2)  # (B, n_out, K, Cin)
    return jnp.einsum(
        "btkc,kco->bto", patches, w, preferred_element_type=x.dtype
    )


def _tap_views(x: jax.Array, k: int, stride: int, dilation: int, n_out: int,
               time_axis: int) -> list[jax.Array]:
    """K static tap views of ``x``, each with time length n_out.

    stride==1: K shifted static slices — XLA fuses them into the GEMM's
    operand reads. stride>1: write each tap offset j*dilation = q*stride+r,
    reshape time into (frames, stride) ONCE, and take tap j as the static
    contiguous slice frames[q : q+n_out] at phase r (dsp/resample.py's
    framing). No strided indexing anywhere; the zero-pad at the tail is
    never read by a valid tap (position t_out*stride + j*dilation <= t-1 by
    construction of n_out).
    """
    tax = time_axis
    t = x.shape[tax]
    if stride == 1:
        return [
            jax.lax.slice_in_dim(x, j * dilation, j * dilation + n_out, axis=tax)
            for j in range(k)
        ]
    q_max = ((k - 1) * dilation) // stride
    need = (n_out + q_max) * stride
    if need > t:
        pad = [(0, 0)] * x.ndim
        pad[tax] = (0, need - t)
        x = jnp.pad(x, pad)
    elif need < t:
        x = jax.lax.slice_in_dim(x, 0, need, axis=tax)
    shape = list(x.shape)
    shape[tax : tax + 1] = [n_out + q_max, stride]
    frames = x.reshape(shape)
    taps = []
    for j in range(k):
        q, r = divmod(j * dilation, stride)
        sl = jax.lax.slice_in_dim(frames, q, q + n_out, axis=tax)
        taps.append(jax.lax.index_in_dim(sl, r, axis=tax + 1, keepdims=False))
    return taps
