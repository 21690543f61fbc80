"""CLAP (HTSAT-tiny) ablation breakdown INSIDE the full bench forward.

Take 2: the first breakdown (scripts/htsat_breakdown_probe.py) timed the
tower with the mel as a jit ARGUMENT and measured nonsense (tower-only
slower than mel+tower: bf16 12.7 vs 4.87 ms; f32 ablations flat at ~7.7 ms
while the CPU cost analysis proves the ablation removes 95% of the flops)
— some axon-side artifact of the argument-fed small call. This version
keeps the exact bench graph shape (mel computed from chunks inside the jit,
projection + f32 sum at the end) and ablates pieces inside it, so every
variant is the same kind of call the family sweep times.

Variants: full / no_blocks (all 12 Swin blocks identity) / no_attn
(_window_attention identity; LN+MLP+layout kept) / no_mlp (block MLP halves
removed) / mel_only (sum right after the mel frontend).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/htsat_breakdown2_probe.py
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

    import fadtk_tpu.models.htsat as ht
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
    orig_swin = ht._swin_block
    orig_attn = ht._window_attention

    def identity_swin(cfg, p, x, dims, num_heads, shift):
        return x

    def identity_attn(cfg, p, x, num_heads, window, attn_mask):
        return x

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params32
        )
        chunks = jnp.asarray(rng.standard_normal((16, 480000)), jnp.float32) * 0.1

        def make_full():
            @jax.jit
            def step(acc, p, ch):
                mel = torchlibrosa_log_mel(ch + acc * 1e-12, **_MEL).astype(dt)
                pooled = htsat_forward(HTSAT_TINY, p, mel[:, None, :, :])
                proj = clap_audio_projection(p["audio_projection"], pooled)
                return acc + proj.astype(jnp.float32).sum()

            return step

        def make_mel_only():
            @jax.jit
            def step(acc, p, ch):
                mel = torchlibrosa_log_mel(ch + acc * 1e-12, **_MEL).astype(dt)
                return acc + mel.astype(jnp.float32).sum()

            return step

        res = {}
        ht._swin_block = orig_swin
        ht._window_attention = orig_attn
        res["full"] = round(window_ms(make_full(), (params, chunks), rtt), 2)
        res["mel_only"] = round(window_ms(make_mel_only(), (params, chunks), rtt), 2)

        ht._swin_block = identity_swin
        res["no_blocks"] = round(window_ms(make_full(), (params, chunks), rtt), 2)

        ht._swin_block = orig_swin
        ht._window_attention = identity_attn
        res["no_attn"] = round(window_ms(make_full(), (params, chunks), rtt), 2)
        ht._window_attention = orig_attn

        res["blocks_delta"] = round(res["full"] - res["no_blocks"], 2)
        res["attn_delta"] = round(res["full"] - res["no_attn"], 2)
        out[dtype_name] = res
        print(json.dumps({dtype_name: res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "htsat_breakdown2.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
