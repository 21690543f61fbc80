"""Fused flash attention for the bidirectional encoder stacks.

Why: the XLA attention path materializes the (B, H, T, T) float32 logits and
softmax weights in HBM — at the speech-family bench shape (B=128, H=12,
T=499) that is ~1.5 GB written and re-read per encoder layer, and the profile
shows the transformer stack is memory-bound on exactly this traffic (f32:
192 ms / 12 layers, of which ~half is attention HBM time; the model's MXU
ideal is 65 ms). This kernel streams K/V blocks through VMEM with the online
softmax, so per (batch, head) only the (T, D) inputs and output ever touch
HBM.

Scope: non-causal self attention with an optional *prefix* key mask (keys
``>= n_valid[b]`` are padding) — what the speech encoders (w2v2/HuBERT/MERT)
and the Whisper encoder need — plus an optional *factorized* additive bias
``gate[b, h, tq] * position_bias[h, tq, tk]``, which is exactly WavLM's gated
relative position bias. The factorization is the key: the dense (B, H, T, T)
bias never materializes — the kernel streams (H, T, T) position-bias blocks
(12 MB at H=12, T=512: batch-independent) and a (B, H, T) row gate, so WavLM
gets the same HBM-traffic win as the unbiased families.

Numerics: logits, the running softmax state and the output accumulator are
float32 regardless of input dtype (matching the XLA path's
``preferred_element_type=jnp.float32``); the result is cast back to the input
dtype. The online softmax reorders the sum, so results match the reference
softmax to float32 roundoff (~1e-6 relative), not bit-exactly.

Layout: grid (B*H, Tq/BQ, Tkv/BK), innermost kv dimension iterated
sequentially per TPU grid semantics; the (m, l, acc) state lives in VMEM
scratch and is re-initialized when kv_idx == 0 and flushed at the last kv
block. Time is padded to a multiple of the block sizes at the caller and the
padding is folded into the key mask.

What binds the kernel (measured, round 3, B=128/H=12/T=499 bf16 = 7.4 ms):
NOT the elementwise VPU passes — replacing exp with a 2-op linear gave
7.43 -> 7.67 ms (noise), and removing two full (BQ, BK) passes (folding the
1/sqrt(d) scale into q + turning the iota/select mask into a (1, BK) row-mask
add) measured 7.49 vs 7.39 ms. NOT grid-step count either — grouping G heads
per step (6x fewer steps) measured 8.29 vs 7.39 ms (dead end, kept as the
`grouped` knob). The real bind is DMA row width: per-(b,h) blocks of
(block, d=64) DMA 128-byte rows (well under efficient burst size) and the
model pays 4 (B,H,T,D)<->(B,T,H*D) transposes around the call. The
packed-heads kernel (`flash_attention_packed`) fixes both by consuming the
projection layout directly — measured at the model call-site boundary
(transposes included for the per-(b,h) path): bf16 T=499 7.98 -> 4.74 ms,
f32 12.63 -> 7.79 ms, H=16 bf16 11.15 -> 7.75 ms. WavLM's factorized bias
also streams through the packed kernel now ((H, BQ, BK) slabs at
VMEM-fitted 256 blocks) — but the whole-model win is small (109.8 -> 107.4
ms, +2.2%; scripts/wavlm_packed_probe.py): the wavlm bias tax (19 ms of
109, scripts/wavlm_bias_cost_probe.py) is NOT the pb DMA (streaming pb in
bf16 recovered only 1.4 ms more) but the per-head gate*pb VPU add passes
and the gate projection itself — a semantic cost. The per-(b,h) kernel
remains as the tested fallback.

What binds the PACKED kernel (measured, round 3, same geometry = 4.13 ms):
fast_exp and fast_dot are dead ends here too (4.15 / 4.12 / 4.15 ms for
exp-in-bf16 / dots-in-bf16 / both — scripts/flash_packed_fastmath_probe.py).
The floor is structural: the logits dot (BQ, 64)x(64, BK) and the av dot
(BQ, BK)x(BK, 64) are MXU *pass*-capped at 50% fill (K resp. N = 64 pads to
the 128 pipeline — a semantic property of head_dim, not a layout fixable
one; block-diagonal head packing is futile because its zero fraction equals
the pad fraction), and the remaining ~2-3 ms is the per-head VPU softmax
chain (~6 passes over (BQ, BK) f32 per head), which bf16 exp does not dent
because exp is one pass of six.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)  # finite "-inf" (NaN-safe)


def flash_attention_enabled() -> bool:
    """Use the fused kernel? Default: on for TPU-class backends, off on CPU
    (tests run the XLA path on the virtual CPU mesh; the kernel itself is
    CPU-testable via interpret=True)."""
    env = os.environ.get("FADTK_TPU_FLASH_ATTENTION")
    if env is not None and env.strip():
        # Same truthy set as FADTK_TPU_BF16 (models/precision.py) so
        # "true"/"on" enable rather than silently disabling the kernel.
        from ..models.precision import _TRUTHY

        return env.strip().lower() in _TRUTHY
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _body(
    nv_ref, q_ref, k_ref, v_ref, pb_ref, g_ref, o_ref, m_ref, l_ref, acc_ref,
    *, h, fast_exp=False, fast_dot=False,
):
    """One (batch*head, q-block, kv-block) program step.

    nv_ref: (B,) int32 scalar-prefetch — per-batch valid key counts.
    q_ref: (1, BQ, D); k_ref/v_ref: (1, BK, D); o_ref: (1, BQ, D).
    pb_ref: (1, BQ, BK) f32 position-bias block or None;
    g_ref: (1, BQ, 1) f32 per-query-row gate block or None (both or neither).
    Scratch m/l: (BQ, 1) f32; acc: (BQ, D) f32 — carried across kv blocks.

    kv blocks that start at or beyond n_valid are fully masked: their exact
    contribution is p = exp(_NEG - m) = 0, so the whole compute is skipped
    (the caller's index maps also clamp their k/v block indices, so the
    pipeline re-uses the resident block instead of DMA-ing dead keys — a
    short clip inside a long padding bucket pays attention work ~ its own
    valid length, not the bucket length). Query blocks entirely beyond
    n_valid skip too and flush exact zeros (acc=0 / max(l, eps)): padded
    rows only ever feed masked keys downstream and are excluded from stats
    by the frame mask, so zeros are as good as the XLA path's
    attend-over-valid-prefix values — and a short clip's attention cost
    becomes ~ceil(nv/block)^2 blocks, quadratic in its own length.
    """
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    n_valid = nv_ref[pl.program_id(0) // h]
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(kv_idx * bk < n_valid, q_idx * bq < n_valid))
    def _compute():
        q = q_ref[0]  # blocks carry a leading (b*h)-block dim of 1
        k = k_ref[0]
        bq, d = q.shape
        if fast_dot:
            # f32 inputs: multiply in bf16, accumulate f32 — the exact
            # semantics XLA's DEFAULT precision gives f32 matmuls on TPU
            # (Mosaic would otherwise emit full 3-pass f32 MXU multiplies).
            q = q.astype(jnp.bfloat16)
            k = k.astype(jnp.bfloat16)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        s = s * (d ** -0.5)

        if pb_ref is not None:
            # Factorized additive bias (WavLM): gate[row] * position_bias
            # [row, col], matching the XLA path's `logits +
            # (gate[..., None] * pb)` in f32.
            s = s + g_ref[0] * pb_ref[0]

        # Prefix key mask: global key index >= n_valid -> masked. Padding rows
        # added to reach the block multiple have index >= T >= n_valid too.
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col < n_valid, s, _NEG)

        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        if fast_exp:
            # The (BQ, BK) exp is the VPU hot spot; bf16 exp runs ~1.8x the
            # f32 rate on v5e (packed VPU) — state (m, l) and accumulation
            # stay f32, only the elementwise exp input narrows. s - m_new
            # <= 0 so p in [0, 1]: bf16's 8 mantissa bits give ~0.4% relative
            # error on weights that then renormalize.
            p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        else:
            p = jnp.exp(s - m_new)

        l_ref[:] = l_ref[:] * alpha + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32
        )
        pv_dtype = jnp.bfloat16 if fast_dot else v_ref.dtype
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(pv_dtype), v_ref[0].astype(pv_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _flush():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _kernel(nv_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, h, **kw):
    _body(nv_ref, q_ref, k_ref, v_ref, None, None, o_ref, m_ref, l_ref, acc_ref, h=h, **kw)


def _kernel_grouped(
    nv_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, groups_per_b,
    fast_exp=False, fast_dot=False,
):
    """One grid step per (batch·head-group, q-block, kv-block), G heads per
    step.

    The ungrouped kernel's measured bind (module docstring) is per-grid-step
    pipeline overhead across b*h steps, not math: at the speech geometry
    (B=128, H=12, T=499) compute+DMA first-principles is ~1 ms of a 7.4 ms
    call. Grouping G heads inside one step cuts the grid to b*h/G steps,
    amortizing that overhead; the per-head dots are unchanged MXU work. G is
    bounded by VMEM: blocks carry (1, G, BQ/BK, D) slabs whose last dim
    lane-pads to 128 (d=64 slabs occupy 2x their nominal bytes — the all-heads
    variant OOMed scoped VMEM at 21 MB vs the 16 MB limit), so the caller
    picks the largest divisor of H that fits (`_pick_group`).

    q_ref/k_ref/v_ref: (1, G, BQ/BK, D); o_ref: (1, G, BQ, D);
    m/l: (G, BQ, 1) f32; acc: (G, BQ, D) f32. nv indexes by
    program_id(0) // groups_per_b (all groups of a batch share n_valid).
    """
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    n_valid = nv_ref[pl.program_id(0) // groups_per_b]
    g = q_ref.shape[1]
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(kv_idx * bk < n_valid, q_idx * bq < n_valid))
    def _compute():
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        key_live = col < n_valid
        d = q_ref.shape[3]
        for hh in range(g):
            q = q_ref[0, hh]
            k = k_ref[0, hh]
            if fast_dot:
                q = q.astype(jnp.bfloat16)
                k = k.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * (d ** -0.5)
            s = jnp.where(key_live, s, _NEG)

            m_prev = m_ref[hh]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            if fast_exp:
                p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            else:
                p = jnp.exp(s - m_new)
            l_ref[hh] = l_ref[hh] * alpha + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            pv_dtype = jnp.bfloat16 if fast_dot else v_ref.dtype
            acc_ref[hh] = acc_ref[hh] * alpha + jax.lax.dot_general(
                p.astype(pv_dtype), v_ref[0, hh].astype(pv_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[hh] = m_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _flush():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _kernel_bias(nv_ref, q_ref, k_ref, v_ref, pb_ref, g_ref, o_ref, m_ref, l_ref, acc_ref, *, h, **kw):
    _body(nv_ref, q_ref, k_ref, v_ref, pb_ref, g_ref, o_ref, m_ref, l_ref, acc_ref, h=h, **kw)


# (block, per-step overhead penalty): padded length tp = round_up(T, block)
# scales the per-(b,h) matmul AND VPU-softmax work as tp_q * tp_kv, so
# minimizing tp dominates; smaller blocks pay grid/pipeline overhead
# (measured at T=512: 512-blocks 7.5 ms vs 128/512-blocks 8.7 ms -> ~1.1-1.25x).
# 512 is listed first so exact-multiple shapes keep the measured-optimal
# config; 768 exists for the 24 kHz families whose 10 s bucket is T=749
# (512 pads to 1024 = +78% attention work; 768 runs one single kv block —
# whole-model A/B on v5e: MERT-v1-95M bf16 327 -> 264 ms/call, +24%, with
# w2v2-base/wavlm-base unchanged at their 512-multiple shapes).
_BLOCK_CANDIDATES = ((512, 1.0), (768, 1.0), (384, 1.06), (256, 1.12), (128, 1.25))


def _pick_block(t: int) -> int:
    """Square block size minimizing padded attention work for length t."""
    best_b, best_cost = None, None
    for b, penalty in _BLOCK_CANDIDATES:
        cost = _round_up(t, b) * penalty
        if best_cost is None or cost < best_cost:
            best_b, best_cost = b, cost
    return best_b


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_q", "block_kv", "interpret", "fast_exp", "fast_dot", "grouped"
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_valid: jax.Array | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    position_bias: jax.Array | None = None,
    gate: jax.Array | None = None,
    fast_exp: bool = False,
    fast_dot: bool = False,
    grouped: bool | None = None,
) -> jax.Array:
    """softmax(q k^T / sqrt(d) + gate ⊙ position_bias) v with an optional
    prefix key mask.

    q, k, v: (B, H, T, D); n_valid: (B,) int32 valid key counts (None = all
    T keys valid). position_bias: (H, T, T) and gate: (B, H, T) — the
    factorized additive bias ``gate[b,h,tq] * position_bias[h,tq,tk]``
    (WavLM's gated relative position bias); pass both or neither. Returns
    (B, H, T, D) in q's dtype; rows t >= n_valid[b] are padding whose exact
    values are unspecified-but-finite: rows in the block straddling n_valid
    attend over the valid prefix (like the XLA path), rows in fully-masked
    query blocks flush exact zeros (the block is skipped). Callers must mask
    padded rows downstream (the frame mask) and may not rely on their values.

    block_q/block_kv default to an adaptive per-shape choice (`_pick_block`)
    that minimizes the padded length — e.g. T=749 (24 kHz 10 s bucket) runs a
    single 768 block instead of padding to 1024 with 512s. kv blocks entirely
    beyond n_valid[b] are skipped (no dot, no DMA), so ragged clips inside a
    padding bucket pay for their own length.

    grouped (default auto, kill-switch FADTK_TPU_FLASH_GROUPED=0): process all
    H heads of one batch element per grid step (`_kernel_grouped`) when there
    is no position bias and the (1, H, block, D) slabs fit VMEM — b grid steps
    instead of b*h, amortizing the measured per-step pipeline overhead that
    dominates this kernel (module docstring). Falls back to the per-(b,h)
    grid for the WavLM bias path and VMEM-oversized shapes.
    """
    if interpret is None:
        # Pallas has no CPU lowering: when the kernel is force-enabled on the
        # virtual CPU mesh (multi-chip dryruns, tests) run the interpreter so
        # the same call sites exercise the same kernel code everywhere.
        interpret = jax.default_backend() == "cpu"
    b, h, t, d = q.shape
    if n_valid is None:
        nv = jnp.full((b,), t, jnp.int32)
    else:
        nv = jnp.maximum(n_valid.astype(jnp.int32), 1)
    assert (position_bias is None) == (gate is None), "pass both bias parts or neither"

    # One explicit block size fixes both: mixing an explicit size with the
    # adaptive default could pick sizes that don't both divide tp (e.g.
    # block_q=512 with adaptive 768 at t=749), leaving output rows unwritten.
    if block_q is None and block_kv is None:
        block_q = block_kv = _pick_block(t)
    elif block_q is None:
        block_q = block_kv
    elif block_kv is None:
        block_kv = block_q
    # Clamp explicit blocks for short sequences.
    block_q = min(block_q, _round_up(t, 128))
    block_kv = min(block_kv, _round_up(t, 128))
    tp = _round_up(t, max(block_q, block_kv))
    assert tp % block_q == 0 and tp % block_kv == 0, (
        f"block sizes ({block_q}, {block_kv}) must both divide the padded "
        f"length {tp} — mismatched explicit blocks would leave grid rows "
        "uncomputed"
    )
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    if grouped is None:
        # Measured DEAD END, default off: G heads per grid step cut the grid
        # 6x but ran SLOWER (B=128/H=12/T=499 bf16: 8.29 vs 7.39 ms;
        # f32 11.22 vs 10.82 — scripts/flash_grouped_probe.py). Step count is
        # not this kernel's bind; DMA row width is (see flash_attention_packed,
        # which wins 7.98 -> 4.74 ms at the model call-site boundary). Kept as
        # a knob for probe reproducibility.
        env = os.environ.get("FADTK_TPU_FLASH_GROUPED", "").strip()
        grouped = env == "1"
    if grouped and position_bias is None:
        g = _pick_group(h, block_q, block_kv, d, q.dtype.itemsize)
        if g > 1:
            gpb = h // g  # head-groups per batch element

            def _q_qi_g(i, qi, nv):
                return jnp.minimum(qi, jnp.maximum(nv[i // gpb] - 1, 0) // block_q)

            def _kv_ki_g(i, ki, nv):
                return jnp.minimum(ki, jnp.maximum(nv[i // gpb] - 1, 0) // block_kv)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b * gpb, tp // block_q, tp // block_kv),
                in_specs=[
                    pl.BlockSpec(
                        (1, g, block_q, d),
                        lambda i, qi, ki, nv: (i // gpb, i % gpb, _q_qi_g(i, qi, nv), 0),
                    ),
                    pl.BlockSpec(
                        (1, g, block_kv, d),
                        lambda i, qi, ki, nv: (i // gpb, i % gpb, _kv_ki_g(i, ki, nv), 0),
                    ),
                    pl.BlockSpec(
                        (1, g, block_kv, d),
                        lambda i, qi, ki, nv: (i // gpb, i % gpb, _kv_ki_g(i, ki, nv), 0),
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, g, block_q, d), lambda i, qi, ki, nv: (i // gpb, i % gpb, qi, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((g, block_q, 1), jnp.float32),
                    pltpu.VMEM((g, block_q, 1), jnp.float32),
                    pltpu.VMEM((g, block_q, d), jnp.float32),
                ],
            )
            out = pl.pallas_call(
                functools.partial(
                    _kernel_grouped, groups_per_b=gpb,
                    fast_exp=fast_exp, fast_dot=fast_dot,
                ),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
                interpret=interpret,
            )(nv, q, k, v)
            return out[:, :, :t, :]

    qf = q.reshape(b * h, tp, d)
    kf = k.reshape(b * h, tp, d)
    vf = v.reshape(b * h, tp, d)

    def _kv_ki(bh, ki, nv):
        # Clamp the kv block index to the last block holding valid keys:
        # later steps skip compute in _body, and the constant block index
        # lets the pipeline skip their DMA (the resident block is re-used).
        return jnp.minimum(ki, jnp.maximum(nv[bh // h] - 1, 0) // block_kv)

    def _q_qi(bh, qi, nv):
        # Same clamp for query blocks fully beyond n_valid (compute skipped,
        # output flushed as zeros — don't DMA dead query rows either).
        return jnp.minimum(qi, jnp.maximum(nv[bh // h] - 1, 0) // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, nv: (bh, _q_qi(bh, qi, nv), 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, qi, ki, nv: (bh, _kv_ki(bh, ki, nv), 0)),
        pl.BlockSpec((1, block_kv, d), lambda bh, qi, ki, nv: (bh, _kv_ki(bh, ki, nv), 0)),
    ]
    operands = [nv, qf, kf, vf]
    kernel = _kernel
    if position_bias is not None:
        # (H, T, T) pads to the block grid; padded keys are masked by nv and
        # padded query rows are sliced off below. The (B, H, T) gate reshapes
        # to (B*H, T_pad, 1) so its block is a VMEM-friendly (BQ, 1) column.
        pbf = jnp.pad(
            position_bias.astype(jnp.float32),
            ((0, 0), (0, tp - position_bias.shape[1]), (0, tp - position_bias.shape[2])),
        )
        gf = jnp.pad(
            gate.astype(jnp.float32), ((0, 0), (0, 0), (0, tp - gate.shape[2]))
        ).reshape(b * h, tp, 1)
        in_specs += [
            pl.BlockSpec(
                (1, block_q, block_kv),
                lambda bh, qi, ki, nv: (bh % h, _q_qi(bh, qi, nv), _kv_ki(bh, ki, nv)),
            ),
            pl.BlockSpec(
                (1, block_q, 1),
                lambda bh, qi, ki, nv: (bh, _q_qi(bh, qi, nv), 0),
            ),
        ]
        operands += [pbf, gf]
        kernel = _kernel_bias

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, tp // block_q, tp // block_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, nv: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(kernel, h=h, fast_exp=fast_exp, fast_dot=fast_dot),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, tp, d)[:, :, :t, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_packed(
    nv_ref, q_ref, k_ref, v_ref, *rest, num_heads, has_bias=False,
    fast_exp=False, fast_dot=False,
):
    """Packed-heads step: blocks carry (1, BQ/BK, H*D) rows in the MODEL's
    projection layout; heads are static lane slices.

    Why this layout (both measured): (a) the per-(b,h) and grouped grids DMA
    (block, 64)-shaped slabs whose rows are 128 contiguous bytes — far below
    efficient DMA burst size — while packed rows are H*D*itemsize (1.5 KB at
    H=12 bf16) contiguous; (b) the model no longer pays the 4 (B,H,T,D)
    transposes around the kernel — q/k/v arrive as the projection GEMM wrote
    them and the output feeds out_proj directly.

    q_ref/k_ref/v_ref: (1, BQ/BK, H*D); o_ref: (1, BQ, H*D);
    m/l scratch: (BQ, H) f32 (head per lane); acc: (BQ, H*D) f32.

    has_bias adds WavLM's factorized bias as two streamed operands:
    pb_ref (H, BQ, BK) position-bias block — batch-independent; the
    per-(b,h) kernel re-reads it per batch element — and g_ref (1, BQ, H)
    per-query-row gates in the (B, T, H) layout. Bias math mirrors the XLA
    path: s += gate[row] * pb[row, col] in f32 before the prefix mask.
    ONE body serves both variants so masking/flush fixes cannot drift.
    """
    if has_bias:
        pb_ref, g_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
        pb_ref = g_ref = None
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    n_valid = nv_ref[pl.program_id(0)]
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    d = q_ref.shape[2] // num_heads

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(kv_idx * bk < n_valid, q_idx * bq < n_valid))
    def _compute():
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        key_live = col < n_valid
        for hh in range(num_heads):
            sl = slice(hh * d, (hh + 1) * d)
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            if fast_dot:
                q = q.astype(jnp.bfloat16)
                k = k.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * (d ** -0.5)
            if has_bias:
                s = s + g_ref[0][:, hh : hh + 1].astype(jnp.float32) * pb_ref[
                    hh
                ].astype(jnp.float32)
            s = jnp.where(key_live, s, _NEG)

            m_prev = m_ref[:, hh : hh + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            if fast_exp:
                p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            else:
                p = jnp.exp(s - m_new)
            l_ref[:, hh : hh + 1] = l_ref[:, hh : hh + 1] * alpha + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            pv_dtype = jnp.bfloat16 if fast_dot else v_ref.dtype
            acc_ref[:, sl] = acc_ref[:, sl] * alpha + jax.lax.dot_general(
                p.astype(pv_dtype), v_ref[0][:, sl].astype(pv_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:, hh : hh + 1] = m_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _flush():
        for hh in range(num_heads):
            sl = slice(hh * d, (hh + 1) * d)
            o_ref[0, :, sl] = (
                acc_ref[:, sl]
                / jnp.maximum(l_ref[:, hh : hh + 1], 1e-30)
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "block_q", "block_kv", "interpret", "fast_exp", "fast_dot"
    ),
)
def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_valid: jax.Array | None = None,
    position_bias: jax.Array | None = None,
    gate: jax.Array | None = None,
    *,
    num_heads: int,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool | None = None,
    fast_exp: bool = False,
    fast_dot: bool = False,
) -> jax.Array:
    """Flash attention over (B, T, H*D)-packed q/k/v — the projection GEMM's
    own layout — returning (B, T, H*D) ready for out_proj.

    Same math and padded-row contract as `flash_attention` (prefix key mask,
    fully-masked query blocks flush exact zeros, kv blocks beyond n_valid are
    skipped compute+DMA via clamped index maps). WavLM's factorized bias is
    supported via ``position_bias`` (H, T, T) and ``gate`` (B, T, H): the
    bias blocks stream per (b, q, kv) step — the (H, BQ, BK) slab budget is
    what forces the smaller block sizes picked below (the per-(b,h) kernel
    additionally paid 128-byte DMA rows and 4 head transposes; the wavlm
    whole-model A/B is in scripts/wavlm_packed_probe.py).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, hd = q.shape
    assert hd % num_heads == 0
    if n_valid is None:
        nv = jnp.full((b,), t, jnp.int32)
    else:
        nv = jnp.maximum(n_valid.astype(jnp.int32), 1)

    has_bias = position_bias is not None
    assert has_bias == (gate is not None), "position_bias and gate come together"
    if block_q is None and block_kv is None:
        block_q = block_kv = _pick_block(t)
    elif block_q is None:
        block_q = block_kv
    elif block_kv is None:
        block_kv = block_q
    block_q = min(block_q, _round_up(t, 128))
    block_kv = min(block_kv, _round_up(t, 128))
    pb_bytes = position_bias.dtype.itemsize if has_bias else 0
    block_q, block_kv = _fit_packed_blocks(
        block_q, block_kv, hd, q.dtype.itemsize, num_heads, pb_bytes, has_bias
    )
    tp = _round_up(t, max(block_q, block_kv))
    assert tp % block_q == 0 and tp % block_kv == 0
    if tp != t:
        pad = ((0, 0), (0, tp - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if has_bias:
            position_bias = jnp.pad(
                position_bias, ((0, 0), (0, tp - t), (0, tp - t))
            )
            gate = jnp.pad(gate, ((0, 0), (0, tp - t), (0, 0)))

    def _qi(bi, qi, nv):
        return jnp.minimum(qi, jnp.maximum(nv[bi] - 1, 0) // block_q)

    def _ki(bi, ki, nv):
        return jnp.minimum(ki, jnp.maximum(nv[bi] - 1, 0) // block_kv)

    in_specs = [
        pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki, nv: (bi, _qi(bi, qi, nv), 0)),
        pl.BlockSpec((1, block_kv, hd), lambda bi, qi, ki, nv: (bi, _ki(bi, ki, nv), 0)),
        pl.BlockSpec((1, block_kv, hd), lambda bi, qi, ki, nv: (bi, _ki(bi, ki, nv), 0)),
    ]
    operands = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (num_heads, block_q, block_kv),
                lambda bi, qi, ki, nv: (0, _qi(bi, qi, nv), _ki(bi, ki, nv)),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, num_heads),
                lambda bi, qi, ki, nv: (bi, _qi(bi, qi, nv), 0),
            )
        )
        operands += [position_bias, gate]
    kernel = functools.partial(
        _kernel_packed, num_heads=num_heads, has_bias=has_bias,
        fast_exp=fast_exp, fast_dot=fast_dot,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, tp // block_q, tp // block_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki, nv: (bi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, num_heads), jnp.float32),
            pltpu.VMEM((block_q, num_heads), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tp, hd), q.dtype),
        interpret=interpret,
    )(nv, *operands)
    return out[:, :t, :]


_PACKED_VMEM_BUDGET = 13 * 2**20


def _fit_packed_blocks(
    block_q: int, block_kv: int, hd: int, itemsize: int, num_heads: int,
    pb_bytes: int, has_bias: bool,
) -> tuple[int, int]:
    """Halve the larger block dim until the step's VMEM estimate fits.

    Estimate: double-buffered q/k/v/out slabs + f32 scratch + ~4 transient
    (BQ, BK) f32 tiles (s, p, col/mask, exp temps — omitting these OOMed
    MERT's 768/768/hd=768 shape at 26.6 MB vs the 16 MB limit), plus the
    double-buffered (H, BQ, BK) position-bias slab and (BQ, H) gate when the
    factorized bias is streamed. The bias terms MUST vanish when bias-free:
    the plain configs are whole-model-A/B'd (w2v2 bf16 512/512, f32 256/512,
    MERT 384/768) and pinned by tests/test_flash_attention.py.
    """
    while max(block_q, block_kv) > 128:
        est = (
            2 * (block_q + 2 * block_kv) * hd * itemsize  # q/k/v slabs
            + 2 * block_q * hd * itemsize  # out
            + block_q * hd * 4  # acc
            + 2 * block_q * 128 * 4  # m, l (lane-padded)
            + 4 * block_q * block_kv * 4  # transient logits/weights tiles
            + 2 * num_heads * block_q * block_kv * pb_bytes
            + (2 * block_q * max(num_heads, 128) * 4 if has_bias else 0)
        )
        if est <= _PACKED_VMEM_BUDGET:
            break
        if block_q >= block_kv:
            block_q //= 2
        else:
            block_kv //= 2
    return block_q, block_kv




# Scoped-VMEM budget for the grouped slabs. The hardware limit is 16 MB; the
# transient (BQ, BK) f32 logits/weights tiles inside the step live on the same
# stack, so leave headroom.
_GROUP_VMEM_BUDGET = 12 * 2**20


def _pick_group(h: int, block_q: int, block_kv: int, d: int, itemsize: int) -> int:
    """Largest divisor of h whose (1, G, block, d) slabs fit scoped VMEM.

    Mosaic lane-pads the trailing dim to 128 (d=64 slabs cost 2x their nominal
    bytes; the (G, BQ, 1) m/l scratch costs 128x) — the all-heads first cut
    ignored this and OOMed scoped VMEM (21 MB vs the 16 MB limit) at the
    speech geometry. Counted per head: 3 double-buffered input blocks + the
    double-buffered output block (input dtype) + f32 m/l/acc scratch.
    """
    dp = _round_up(d, 128)
    for g in range(h, 1, -1):
        if h % g:
            continue
        per_head = (
            3 * 2 * max(block_q, block_kv) * dp * itemsize  # q/k/v, double-buffered
            + 2 * block_q * dp * itemsize                   # out, double-buffered
            + 2 * block_q * 128 * 4                         # m, l (lane-padded)
            + block_q * dp * 4                              # acc
        )
        if g * per_head <= _GROUP_VMEM_BUDGET:
            return g
    return 1
