"""Byte-floor bounds for the two remaining narrow-channel conv families
(DAC-44k, CDPAM) — the round-4 PERF.md rows whose "bandwidth bound" was
asserted from intensity arithmetic, never measured (the EnCodec treatment,
PERF.md §3.4, applied to the rest of the conv zoo).

Per family and dtype, at the bench geometry:

1. Analytic HBM floors under TWO conventions:
   - ``rw``: every materialized activation crosses HBM twice — written by its
     producer conv, read by its consumer (elementwise snake/BN/leaky/mask
     fused free; residual shortcut shares the block input read) — the
     EnCodec §3.4 convention;
   - ``w``: each activation crosses once (producer write only) — the limit
     where XLA overlaps each conv's input stream with the previous conv's
     output stream so the HBM bus sees every byte once. A model can land
     between the two; below ``w`` would mean the floor model is wrong.
2. Measured whole-model ms (honest tunneled protocol: chained windows, host
   value fetch, RTT subtracted — probe_timing.py).
3. For CDPAM, a per-depth marginal-cost sweep: the model truncated after
   layer d (sum-reduced, so every kept layer stays load-bearing) for
   d = 0..16; time(d) - time(d-1) is layer d's marginal cost inside the
   full graph (trap #4: never time an isolated layer with argument-fed
   inputs). Early layers dominate bytes 100:1, so the sweep localizes
   which convention the chip actually pays.

Writes .bench_cache/narrow_conv_floor.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/narrow_conv_floor_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt, window_ms  # noqa: E402


# ---------------------------------------------------------------- analytic

def cdpam_floor(b: int, itemsize: int) -> dict:
    """CDPAM: 16 k=3 s=2 'same' convs, channels (64x5,128x5,256x5,512),
    BN+leaky+mask fused free (models/cdpam_impl.py)."""
    from fadtk_tpu.models.cdpam_impl import DEFAULT_CONFIG as cfg

    t = cfg.chunk_samples
    c_in = 1
    writes = reads = wts = 0
    rows = []
    for i, c_out in enumerate(cfg.channels):
        t_out = -(-t // cfg.stride)
        r = b * c_in * t * itemsize
        w = b * c_out * t_out * itemsize
        wt = cfg.kernel_size * c_in * c_out * itemsize
        reads += r
        wts += wt
        writes += w
        rows.append((f"conv{i} {c_in}->{c_out} T{t}->{t_out}", r + w + wt))
        c_in, t = c_out, t_out
    # heads: read pooled feats (tiny) + two (C,512) weight reads
    wts += 2 * (c_in * 512 + 512) * itemsize
    # Weight bytes cross HBM once under EITHER convention (same accounting
    # as dac_floor's w_only — round-4 advisor finding #1).
    return {
        "rw_bytes": reads + writes + wts,
        "w_bytes": writes + wts + b * cfg.chunk_samples * itemsize,  # + input read
        "rows": rows,
    }


def dac_floor(b: int, t_in: int, itemsize: int) -> dict:
    """DAC-44k encoder (models/dac_impl.py): conv_in k7; 4 blocks of
    3 residual units (k7 dilated + k1, snake fused free, shortcut shares the
    block-input read) + strided down-conv k=2s; snake + conv_out k3."""
    from fadtk_tpu.models.dac_impl import DAC_44K as cfg

    act = lambda c, t: b * c * t * itemsize
    rows = []
    rw = w_only = 0

    def add(name, reads, writes, wt):
        nonlocal rw, w_only
        rw += reads + writes + wt
        w_only += writes + wt
        rows.append((name, reads + writes + wt))

    d, t = cfg.d_model, t_in
    add("conv_in 1->64 k7", act(1, t), act(d, t), 7 * 1 * d * itemsize)
    for bi, stride in enumerate(cfg.strides):
        for j, dil in enumerate((1, 3, 9)):
            # x read once (conv1 + shortcut share it); hidden written + read;
            # unit output written. k1 conv weight negligible but counted.
            wt = (7 * d * d + d * d) * itemsize
            add(f"b{bi}.res{j} C={d}", 2 * act(d, t), 2 * act(d, t), wt)
        t_out = -(-t // stride)
        wt = (2 * stride) * d * (2 * d) * itemsize
        add(f"b{bi}.down {d}->{2*d} s{stride}", act(d, t), act(2 * d, t_out), wt)
        d, t = 2 * d, t_out
    add("conv_out 1024->1024 k3", act(d, t), act(cfg.latent_dim, t),
        3 * d * cfg.latent_dim * itemsize)
    # w_only double-counts nothing; add the model input read once.
    return {"rw_bytes": rw, "w_bytes": w_only + act(1, t_in), "rows": rows}


# ---------------------------------------------------------------- measured

def measure_cdpam_ms(b: int, dtype_name: str, depth: int | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.models.cdpam_impl import (
        DEFAULT_CONFIG as cfg,
        _conv1d_same,
        init_cdpam_params,
    )

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        init_cdpam_params(jax.random.PRNGKey(0)),
    )
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((b, cfg.chunk_samples)), jnp.float32) * 8000

    def truncated(p, x):
        """First `depth` conv+BN+leaky layers (no mask: full-length bench
        clips make the mask a no-op numerically; keeping the real conv+BN
        chain is what matters for the byte accounting). depth=None runs the
        whole model INCLUDING the pooled head einsums, matching what
        cdpam_floor charges for (round-4 advisor finding #2); truncated
        depths stay conv-chain-only for the marginal-cost sweep."""
        h = x.astype(dt)[:, :, None]
        for li, (conv, bn) in enumerate(zip(p["convs"], p["norms"])):
            if depth is not None and li >= depth:
                break
            h = _conv1d_same(h, conv["kernel"], conv["bias"], cfg.stride)
            inv = jax.lax.rsqrt(bn["var"] + cfg.bn_eps)
            h = (h - bn["mean"]) * (inv * bn["scale"]) + bn["bias"]
            h = jnp.where(h >= 0, h, cfg.leaky_slope * h)
        total = h.astype(jnp.float32).sum()
        if depth is None:
            feats = h.mean(axis=1)  # (B, C) time-average pool, full-length clips
            for head in ("acoustic", "content"):
                proj = feats @ p[head]["kernel"] + p[head]["bias"]
                total = total + proj.astype(jnp.float32).sum()
        return total

    @jax.jit
    def step(acc, p, x):
        return acc + truncated(p, x * (1.0 + acc * 1e-30))

    rtt = measure_rtt()
    return window_ms(step, (params, chunks), rtt)


def measure_dac_ms(b: int, t_in: int, dtype_name: str) -> float:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.models.dac_impl import DAC_44K, dac_encode, init_dac_params

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        init_dac_params(DAC_44K, jax.random.PRNGKey(0)),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 1, t_in)), jnp.float32) * 0.1

    @jax.jit
    def step(acc, p, a):
        return acc + dac_encode(DAC_44K, p, a * (1.0 + acc * 1e-30)).sum()

    rtt = measure_rtt()
    return window_ms(step, (params, x), rtt)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from encodec_byte_floor import measure_stream_bw

    out: dict = {}
    for dtype_name, itemsize in (("float32", 4), ("bfloat16", 2)):
        bw = measure_stream_bw(dtype_name)
        out[f"stream_bw_GBps_{dtype_name}"] = round(bw, 1)
        print(json.dumps({f"stream_bw_{dtype_name}": round(bw, 1)}), flush=True)

        for name, floor, ms in (
            ("cdpam", cdpam_floor(256, itemsize), measure_cdpam_ms(256, dtype_name)),
            ("dac-44kHz", dac_floor(8, 220500, itemsize),
             measure_dac_ms(8, 220500, dtype_name)),
        ):
            rw_ms = floor["rw_bytes"] / (bw * 1e9) * 1e3
            w_ms = floor["w_bytes"] / (bw * 1e9) * 1e3
            entry = {
                "rw_floor_gb": round(floor["rw_bytes"] / 1e9, 3),
                "w_floor_gb": round(floor["w_bytes"] / 1e9, 3),
                "rw_floor_ms": round(rw_ms, 2),
                "w_floor_ms": round(w_ms, 2),
                "measured_ms": round(ms, 2),
                "ratio_vs_rw": round(ms / rw_ms, 2),
                "ratio_vs_w": round(ms / w_ms, 2),
                "top_rows_gb": [
                    (n_, round(v / 1e9, 3))
                    for n_, v in sorted(floor["rows"], key=lambda r: -r[1])[:5]
                ],
            }
            out[f"{name}-{dtype_name}"] = entry
            print(json.dumps({f"{name}-{dtype_name}": entry}), flush=True)

        # Per-depth marginal sweep (cdpam): where the time actually goes.
        # Depths are dense where the bytes are (layers 1-6 carry ~95% of the
        # traffic) and sparse after — every depth is a separate remote
        # compile (~20-40 s each on the tunneled service).
        depths = [0, 1, 2, 3, 4, 5, 6, 8, 16]
        cum = {}
        for d in depths:
            cum[d] = round(measure_cdpam_ms(256, dtype_name, depth=d), 3)
        out[f"cdpam-{dtype_name}-cumulative_ms_by_depth"] = cum
        print(json.dumps({f"cdpam-{dtype_name}-cum": cum}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "narrow_conv_floor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
