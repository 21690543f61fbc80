"""Padded MXU-pass flop accounting from a traced jaxpr.

The MXU consumes (128, 128, 128) tiles per pass: a matmul with any dimension
below 128 pays a full pass anyway (PERF.md §3.1). This walker traverses a
function's jaxpr (recursing into pjit/scan/cond bodies; scan bodies multiply
by trip count — the XLA cost-analysis undercount, PERF.md §5 trap #2) and
returns, per dot_general / conv_general_dilated:

    exact_flops  = 2 * B * M * K * N
    padded_flops = 2 * B * ceil(M/128) * ceil(K/128) * ceil(N/128) * 128^3

``padded_flops / measured_roofline`` is the MXU-pass-ideal time — the time
the GEMM set would take if every pass issued back-to-back at the measured
tile rate. Convs count as their im2col GEMM (M = batch*out_spatial,
K = C_in/groups * prod(k), N = C_out; grouped convs multiply passes by
groups) — an upper bound on their MXU ideal, which is fine for a ledger
whose conv frontends are accounted by *measurement*, not by this model.

Used by scripts/attention_ledger_probe.py; unit-tested in
tests/test_mxu_passes.py (CPU).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class GemmRecord:
    op: str
    batch: int
    m: int
    k: int
    n: int
    mult: int  # scan trip-count multiplier

    @property
    def exact_flops(self) -> float:
        return 2.0 * self.mult * self.batch * self.m * self.k * self.n

    @property
    def padded_flops(self) -> float:
        c = lambda d: -(-d // 128)
        return (
            2.0 * self.mult * self.batch
            * c(self.m) * c(self.k) * c(self.n) * 128**3
        )


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_record(eqn, mult: int) -> GemmRecord:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    batch = _prod(lhs[i] for i in lb)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    k = _prod(lhs[i] for i in lc)
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(rb))
    return GemmRecord("dot_general", batch, m, k, n, mult)


def _conv_record(eqn, mult: int) -> GemmRecord:
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    # dn.lhs_spec = (batch, feature, *spatial) index positions, etc.
    b = lhs[dn.lhs_spec[0]]
    out_spatial = _prod(out[i] for i in dn.out_spec[2:])
    k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    c_in_per_group = rhs[dn.rhs_spec[1]]
    c_out_per_group = rhs[dn.rhs_spec[0]] // groups
    return GemmRecord(
        "conv", groups, b * out_spatial, k_spatial * c_in_per_group,
        c_out_per_group, mult,
    )


def _walk(jaxpr, mult: int, records: list) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            records.append(_dot_record(eqn, mult))
        elif name == "conv_general_dilated":
            records.append(_conv_record(eqn, mult))
        inner_mult = mult
        if name == "scan":
            inner_mult = mult * int(eqn.params.get("length", 1))
        elif name == "while":
            # Trip count unknowable statically — count the body ONCE and flag.
            records.append(GemmRecord("while_body_counted_once", 0, 0, 0, 0, 1))
        for sub in eqn.params.values():
            for j in _jaxprs_of(sub):
                _walk(j, inner_mult, records)


def _jaxprs_of(obj):
    from jax.extend.core import ClosedJaxpr, Jaxpr

    if isinstance(obj, ClosedJaxpr):
        yield obj.jaxpr
    elif isinstance(obj, Jaxpr):
        yield obj
    elif isinstance(obj, (tuple, list)):
        for x in obj:
            yield from _jaxprs_of(x)


def gemm_records(fn, *args) -> list[GemmRecord]:
    """Trace ``fn(*args)`` and return every GEMM-class op it contains.

    Clears jax's trace cache first: the cache keys on the function object,
    so re-tracing the same ``fn`` after monkeypatching a function it calls
    (the ledger probe's ablation variants) would silently return the STALE
    jaxpr — measured while building scripts/attention_ledger_probe.py."""
    import jax

    jax.clear_caches()
    closed = jax.make_jaxpr(fn)(*args)
    records: list[GemmRecord] = []
    _walk(closed.jaxpr, 1, records)
    return records


def gemm_summary(fn, *args) -> dict:
    recs = gemm_records(fn, *args)
    return {
        "n_gemms": len(recs),
        "exact_tflop": sum(r.exact_flops for r in recs) / 1e12,
        "padded_tflop": sum(r.padded_flops for r in recs) / 1e12,
    }


def mxu_ideal_ms(fn, args, roofline_flops: float) -> dict:
    """MXU-pass-ideal time of the GEMM set at a measured tile rate."""
    s = gemm_summary(fn, *args)
    s["ideal_ms"] = s["padded_tflop"] * 1e12 / roofline_flops * 1e3
    s["exact_ideal_ms"] = s["exact_tflop"] * 1e12 / roofline_flops * 1e3
    return s
