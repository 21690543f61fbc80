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
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

B = 16  # clips per batch (big outputs: the first conv emits ~0.5 GB at B=16)


def timed(fn, *args):
    # Honest tunneled timing: chain + value fetch (CLAUDE.md). Short windows:
    # the big-output layers queue ~0.5 GB per in-flight call.
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(4):
            acc = acc + fn(*args).astype(jnp.float32).ravel()[0]
        float(acc)
        best = min(best, (time.perf_counter() - t0) / 4)
    return best


def conv_xla(x, w, stride, dil):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dil,), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )


def conv_gemm(x, w, stride, dil):
    """The shipped framed-GEMM lowering (ops/conv1d.py): stride==1 taps are
    shifted slices; stride>1 taps are phase slices of a (frames, stride)
    reshape — the ``[::stride]`` form this replaced measured 4.7x slower on
    dac.down1 and hit minutes-long compiles on enc24.down2."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from fadtk_tpu.ops.conv1d import conv1d_ncl

    return conv1d_ncl(x, w, stride=stride, dilation=dil, lowering="gemm")


LAYERS = [
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


def run_layer(idx: int, variant: str):
    """One (layer, variant) measurement — run in a SUBPROCESS so a
    pathological XLA conv compile (they hang for minutes; see
    dsp/resample.py) only times out its own layer."""
    name, cin, cout, k, stride, dil, t = LAYERS[idx]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, cin, t)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cout, cin, k)), jnp.float32) * 0.1
    fn = conv_xla if variant == "conv" else conv_gemm
    f = jax.jit(lambda x, w, s=stride, d=dil: fn(x, w, s, d))
    t0 = time.perf_counter()
    y = f(x, w)
    first = np.asarray(y)  # value-fetch: honest completion
    compile_s = time.perf_counter() - t0
    sec = timed(f, x, w)
    n_out = y.shape[-1]
    gflop = 2 * B * cout * cin * k * n_out / 1e9
    print(json.dumps({
        "layer": name, "variant": variant,
        "compile_s": round(compile_s, 1),
        "ms": round(sec * 1e3, 3),
        "tf": round(gflop / sec / 1e3, 3),
        "gflop": round(gflop, 2),
        "checksum": float(np.abs(first).mean()),
    }), flush=True)


def main():
    """Driver: each (layer, variant) in its own subprocess with a timeout."""
    import subprocess
    import sys

    rows = []
    for i, layer in enumerate(LAYERS):
        for variant in ("conv", "gemm"):
            try:
                p = subprocess.run(
                    [sys.executable, __file__, str(i), variant],
                    capture_output=True, text=True,
                    timeout=float(os.environ.get("CONV_PROBE_TIMEOUT_S", "420")),
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("{")]
                row = json.loads(line[-1]) if line else {
                    "layer": layer[0], "variant": variant,
                    "error": (p.stderr or p.stdout)[-300:],
                }
            except subprocess.TimeoutExpired:
                row = {"layer": layer[0], "variant": variant,
                       "error": "TIMEOUT (pathological compile or execution)"}
            rows.append(row)
            print(row, flush=True)
    out = Path(__file__).parent.parent / ".bench_cache" / "conv_gemm_experiment.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    import os
    import sys

    if len(sys.argv) == 3:
        run_layer(int(sys.argv[1]), sys.argv[2])
    else:
        main()
