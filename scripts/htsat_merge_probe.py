"""Whole-model A/B on TPU: Swin window merging (FADTK_TPU_SWIN_MERGE).

A Swin window is 64 tokens with head_dim 24 (tiny) / 32 (base), so the
attention einsums are batches of (64, hd)x(hd, 64) matmuls at ~4.7% MXU tile
utilization; the in-graph ablation (scripts/htsat_breakdown2_probe.py) put
that core at 2.73 of 4.90 ms (bf16 B=16). Merging G windows per attention
call (static block-diagonal mask, bit-exact per-window results — CPU check
0.0 diff) trades 2x softmax elements for ~4x matmul tile fill at G=2.

This probe times the full bench forward (mel f32 + tower + projection) for
G in {1, 2, 4} at B=16, both dtypes, HTSAT-tiny and HTSAT-base.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/htsat_merge_probe.py
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
        HTSAT_BASE,
        HTSAT_TINY,
        clap_audio_projection,
        htsat_forward,
        init_htsat_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "b": 16}
    chunks = jnp.asarray(rng.standard_normal((16, 480000)), jnp.float32) * 0.1

    for cfg_name, cfg in (("tiny", HTSAT_TINY), ("base", HTSAT_BASE)):
        params32 = init_htsat_params(cfg, jax.random.PRNGKey(0), projection_dim=512)
        for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            params = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
            )
            res = {}
            for g in (1, 2, 4):
                os.environ["FADTK_TPU_SWIN_MERGE"] = str(g)

                @jax.jit
                def step(acc, p, ch):
                    mel = torchlibrosa_log_mel(ch + acc * 1e-12, **_MEL).astype(dt)
                    pooled = htsat_forward(cfg, p, mel[:, None, :, :])
                    proj = clap_audio_projection(p["audio_projection"], pooled)
                    return acc + proj.astype(jnp.float32).sum()

                res[f"g{g}"] = round(window_ms(step, (params, chunks), rtt), 2)
            os.environ.pop("FADTK_TPU_SWIN_MERGE", None)
            res["speedup_g2"] = round(res["g1"] / res["g2"], 3)
            res["speedup_g4"] = round(res["g1"] / res["g4"], 3)
            out[f"{cfg_name}-{dtype_name}"] = res
            print(json.dumps({f"{cfg_name}-{dtype_name}": res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "htsat_merge.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
