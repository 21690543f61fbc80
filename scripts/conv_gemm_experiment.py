"""Round-3 experiment (r2 verdict #4): are the conv families' low
pct_of_measured_roofline numbers an architectural width bound, or an XLA
conv-lowering artifact?

Motivation: round 3 found XLA's TPU conv path can be pathological (the
44.1k->16k resample conv — stride 441, 1256 taps — HUNG the compiler;
reformulated as framing + one GEMM it runs in 0.2 s). This probe times the
actual EnCodec/DAC layer shapes both ways on the real chip:

  A. jax.lax.conv_general_dilated (what encodec_impl/dac_impl use today);
  B. im2col framing (shifted-reshape stack) + one jnp.einsum GEMM.

Run:  python scripts/conv_gemm_experiment.py          # on the TPU
Writes .bench_cache/conv_gemm_experiment.json and prints a table.

The EnCodec 24k encoder layer list (encodec_impl.encoder_plan): conv(1->32,
k7), 4 x [res(k3 + k1) + down k=2*stride] with ratios (2,4,5,8), final
conv(512->128, k7) at 75 Hz. DAC 44k: conv(1->64, k7), blocks with dilated
k7 residual units (d=1,3,9) and strided downs (2,4,8,8).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

B = 64  # clips per batch (the dp pipeline's shape)


def timed(fn, *args):
    fn(*args).block_until_ready()
    out = fn(*args)
    # Honest tunneled timing: chain + value fetch (CLAUDE.md).
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(8):
            acc = acc + fn(*args).astype(jnp.float32).ravel()[0]
        float(acc)
        best = min(best, (time.perf_counter() - t0) / 8)
    return best


def conv_xla(x, w, stride, dil):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dil,), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )


def conv_gemm(x, w, stride, dil):
    """im2col via shifted reshapes + one GEMM. x: (B, Cin, T), w: (Cout, Cin, K)."""
    b, cin, t = x.shape
    cout, _, k = w.shape
    span = (k - 1) * dil + 1  # receptive field
    n_out = (t - span) // stride + 1
    cols = []
    for j in range(k):
        off = j * dil
        if stride == 1:
            cols.append(x[:, :, off : off + n_out])
        else:
            sl = x[:, :, off : off + (n_out - 1) * stride + 1]
            cols.append(sl[:, :, ::stride])
    patches = jnp.stack(cols, axis=2)  # (B, Cin, K, n_out)
    return jnp.einsum(
        "bckt,ock->bot", patches, w, preferred_element_type=jnp.float32
    )


def main():
    layers = [
        # (name, cin, cout, k, stride, dil, T_in)
        ("enc24.conv_in", 1, 32, 7, 1, 1, 240000),
        ("enc24.res1a", 16, 16, 3, 1, 1, 240000),
        ("enc24.down1(s2)", 32, 64, 4, 2, 1, 240000),
        ("enc24.down2(s4)", 64, 128, 8, 4, 1, 120000),
        ("enc24.down3(s5)", 128, 256, 10, 5, 1, 30000),
        ("enc24.down4(s8)", 256, 512, 16, 8, 1, 6000),
        ("enc24.conv_out", 512, 128, 7, 1, 1, 750),
        ("dac.conv_in", 1, 64, 7, 1, 1, 220500),
        ("dac.res_d1", 32, 32, 7, 1, 1, 220500),
        ("dac.res_d9", 32, 32, 7, 1, 9, 220500),
        ("dac.down1(s2)", 32, 64, 4, 2, 1, 220500),
    ]
    rng = np.random.default_rng(0)
    rows = []
    for name, cin, cout, k, stride, dil, t in layers:
        x = jnp.asarray(rng.standard_normal((B, cin, t)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((cout, cin, k)), jnp.float32) * 0.1
        fa = jax.jit(lambda x, w, s=stride, d=dil: conv_xla(x, w, s, d))
        fb = jax.jit(lambda x, w, s=stride, d=dil: conv_gemm(x, w, s, d))
        ya, yb = fa(x, w), fb(x, w)
        err = float(jnp.max(jnp.abs(ya - yb)))
        ta = timed(fa, x, w)
        tb = timed(fb, x, w)
        n_out = ya.shape[-1]
        gflop = 2 * B * cout * cin * k * n_out / 1e9
        row = {
            "layer": name, "conv_ms": round(ta * 1e3, 3),
            "gemm_ms": round(tb * 1e3, 3),
            "speedup": round(ta / tb, 2),
            "gflop": round(gflop, 2),
            "conv_tf": round(gflop / ta / 1e3, 2),
            "gemm_tf": round(gflop / tb / 1e3, 2),
            "max_abs_diff": err,
        }
        rows.append(row)
        print(row, flush=True)
    out = Path(__file__).parent.parent / ".bench_cache" / "conv_gemm_experiment.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
