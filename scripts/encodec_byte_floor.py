"""EnCodec SEANet HBM byte floor vs measured whole-model time (round-3
verdict #3: "bound or beat the conv-chain gap — with numbers, not prose").

Computes, per geometry (24k mono 10 s B=64; 48k stereo 1 s B=64 — the bench
shapes) and dtype:

1. The analytic MINIMUM HBM bytes of the full encoder under ideal fusion:
   every unique activation crosses HBM once per producer/consumer pass
   (elementwise elu fused free into adjacent convs; the resnet's shortcut
   shares its input read with block_conv1; the 48k group-norm pays its
   measured pass structure: f32 two-pass = +2 reads +1 write per conv, bf16
   one-pass = +1 read +1 write), plus weights once.
2. The MEASURED streaming HBM bandwidth of this chip: a lax.scan of a
   dependent elementwise pass over a 256 MiB array (one read + one write per
   iteration, un-fusable across iterations), honest tunneled-device protocol
   (chained windows, host value fetch, RTT subtracted).
3. The measured whole-model ms (same protocol as bench.py's family sweep).

Ratio = measured_time / (min_bytes / measured_bw). If the ratio is ~1.3x the
stack is HBM-bound and closed; a 2-3x gap is schedulable headroom (the
VMEM-resident fused conv-chain question). Writes
.bench_cache/encodec_byte_floor.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/encodec_byte_floor.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt, window_ms  # noqa: E402


def analytic_floor(cfg, b: int, t_in: int, itemsize: int) -> dict:
    """Minimum HBM traffic (bytes) for one forward under ideal fusion."""
    from fadtk_tpu.models.encodec_impl import encoder_plan

    act = lambda c, t: b * c * t * itemsize
    gn = cfg.norm_type == "time_group_norm"
    # group-norm extra passes over each conv output (see module docstring):
    # (extra_reads, extra_writes) of the conv's output activation.
    gn_passes = (0, 0) if not gn else ((2, 1) if itemsize == 4 else (1, 1))

    c_in, t = cfg.audio_channels, t_in
    cur = None
    total = 0
    rows = []

    def add(name, bytes_):
        nonlocal total
        total += bytes_
        rows.append((name, bytes_))

    for kind, idx, meta in encoder_plan(cfg):
        if kind == "conv":
            stride = meta["stride"]
            src = c_in if cur is None else cur
            if cur is None:
                dst = cfg.num_filters
            elif stride > 1:
                dst = cur * 2
            else:
                dst = cfg.hidden_size  # final projection conv
            t_out = -(-t // stride)
            w = src * dst * meta["k"] * itemsize
            extra = act(dst, t_out) * sum(gn_passes)
            add(f"conv{idx} {src}->{dst} k{meta['k']} s{stride}",
                act(src, t) + act(dst, t_out) + w + extra)
            cur, t = dst, t_out
        elif kind == "resnet":
            hidden = cur // cfg.compress
            # x read once (conv1 + shortcut share it), hidden out+in, y out.
            w = (cur * hidden * cfg.residual_kernel_size
                 + hidden * cur * 1 + cur * cur * 1) * itemsize
            extra = (act(hidden, t) + act(cur, t)) * sum(gn_passes)
            add(f"resnet{idx} C={cur}",
                act(cur, t) + 2 * act(hidden, t) + act(cur, t) + w + extra)
        elif kind == "elu":
            pass  # fused free into the adjacent conv pass in the ideal floor
        elif kind == "lstm":
            # Per layer: read seq, write+read the hoisted 4H projection,
            # write seq. Skip-add fused.
            per_layer = act(cur, t) + 2 * act(4 * cur, t) + act(cur, t)
            w = cfg.num_lstm_layers * (8 * cur * cur) * itemsize
            add(f"lstm C={cur}", cfg.num_lstm_layers * per_layer + w)
    return {"total_bytes": total, "rows": rows, "t_frames": t, "c_out": cur}


def measure_stream_bw(dtype_name: str) -> float:
    """Streamed GB/s: scan of a dependent elementwise pass (1R + 1W per
    iteration; iterations serialize through the carry so XLA cannot fuse
    them into fewer passes)."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # elements
    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    itemsize = 2 if dtype_name == "bfloat16" else 4
    iters = 16

    @jax.jit
    def step(acc, x):
        def body(carry, _):
            return carry * jnp.asarray(1.0000001, dt) + jnp.asarray(1e-9, dt), None
        y, _ = jax.lax.scan(body, x * (1.0 + acc * 1e-30).astype(dt), None,
                            length=iters)
        return acc + y[:8].astype(jnp.float32).sum()

    x = jnp.ones((n,), dt)
    rtt = measure_rtt()
    ms = window_ms(step, (x,), rtt)
    # scan body: read + write n*itemsize each iteration.
    return (2.0 * n * itemsize * iters) / (ms * 1e-3) / 1e9


def measure_model_ms(cfg, b, t_in, channels, dtype_name) -> float:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.models.encodec_impl import encodec_encode, init_encodec_params

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        init_encodec_params(cfg, jax.random.PRNGKey(0)),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, channels, t_in)), jnp.float32) * 0.1

    @jax.jit
    def step(acc, p, a):
        return acc + encodec_encode(cfg, p, a * (1.0 + acc * 1e-30)).sum()

    rtt = measure_rtt()
    return window_ms(step, (params, x), rtt)


def main() -> None:
    from fadtk_tpu.models.encodec_impl import CONFIG_24K, CONFIG_48K

    out: dict = {}
    geoms = {
        "encodec-emb": (CONFIG_24K, 64, 240000, 1),
        "encodec-emb-48k": (CONFIG_48K, 64, 48000, 2),
    }
    for dtype_name, itemsize in (("float32", 4), ("bfloat16", 2)):
        bw = measure_stream_bw(dtype_name)
        out[f"stream_bw_GBps_{dtype_name}"] = round(bw, 1)
        print(json.dumps({f"stream_bw_{dtype_name}": round(bw, 1)}), flush=True)
        for name, (cfg, b, t, ch) in geoms.items():
            floor = analytic_floor(cfg, b, t, itemsize)
            floor_ms = floor["total_bytes"] / (bw * 1e9) * 1e3
            ms = measure_model_ms(cfg, b, t, ch, dtype_name)
            entry = {
                "min_hbm_gb": round(floor["total_bytes"] / 1e9, 3),
                "floor_ms_at_measured_bw": round(floor_ms, 2),
                "measured_ms": round(ms, 2),
                "ratio_measured_over_floor": round(ms / floor_ms, 2),
                "top_layers_gb": [
                    (n_, round(v / 1e9, 3))
                    for n_, v in sorted(floor["rows"], key=lambda r: -r[1])[:6]
                ],
            }
            out[f"{name}-{dtype_name}"] = entry
            print(json.dumps({f"{name}-{dtype_name}": entry}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "encodec_byte_floor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
