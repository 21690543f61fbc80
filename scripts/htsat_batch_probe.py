"""CLAP (HTSAT-tiny) batch sweep on TPU: is B=16 overhead-dominated?

The breakdown probe (scripts/htsat_breakdown_probe.py) found that at the
bench geometry (B=16) the f32 forward measures ~7.7 ms/call no matter what
is ablated — even replacing ALL 12 Swin blocks with identity moves it only
7.70 -> 7.62 ms — i.e. the call is floor/overhead-dominated, not
compute-dominated, at this batch. (The bf16 'tower-as-argument' variants
also measured 2.6x slower than the full mel+tower jit, another
small-call instability.) If so, the family's 14/23% roofline numbers are a
batch-size artifact, and both CLAP variants scale with a bigger window batch.

This probe sweeps the whole bench forward (mel f32 + tower + projection)
over B in {16, 32, 64, 128} in both dtypes and reports window-sec/s.

Protocol: chained data dependency + one host value fetch, RTT subtracted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/htsat_batch_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_timing import measure_rtt, window_ms  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.dsp.mel import torchlibrosa_log_mel
    from fadtk_tpu.models.clap_laion import _MEL
    from fadtk_tpu.models.htsat import (
        HTSAT_TINY,
        clap_audio_projection,
        htsat_forward,
        init_htsat_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    params32 = init_htsat_params(HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=512)

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
        )
        res = {}
        for b in (16, 32, 64, 128):
            chunks = jnp.asarray(rng.standard_normal((b, 480000)), jnp.float32) * 0.1

            @jax.jit
            def step(acc, p, ch):
                mel = torchlibrosa_log_mel(ch + acc * 1e-12, **_MEL).astype(dt)
                pooled = htsat_forward(HTSAT_TINY, p, mel[:, None, :, :])
                proj = clap_audio_projection(p["audio_projection"], pooled)
                return acc + proj.astype(jnp.float32).sum()

            ms = window_ms(step, (params, chunks), rtt)
            res[f"b{b}"] = {
                "ms_per_call": round(ms, 2),
                "window_sec_per_sec": round(b * 10 / (ms / 1e3), 1),
            }
            print(json.dumps({dtype_name: {f"b{b}": res[f'b{b}']}}), flush=True)
        out[dtype_name] = res

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "htsat_batch_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
