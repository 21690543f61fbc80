"""DAC + EnCodec-48k ablations on TPU: what do snake / time-group-norm cost?

Both families sit at 13-15% of the measured roofline with a "narrow-channel
conv, width/bandwidth-bound" diagnosis. Two elementwise/reduction suspects
were never separately priced:

- DAC's snake activation (x + sin^2(ax)/a, per-channel alpha) runs at the
  full 44.1 kHz rate between every conv — a VPU transcendental chain.
- EnCodec-48k's time_group_norm does a full (C, T) mean/var reduction after
  every conv (the 24k model has none — it is one of the few structural
  differences, and 48k benches at 8.5% vs 24k's 14.4% bf16).

Ablations (identity-replace, whole-model, bench geometries):
- dac: full vs no_snake (identity activation)
- enc48: full vs no_norm (scale/shift only, no mean/var reduction)

Deltas bound how much a fused/cheaper variant could ever win; if small,
the conv-roofline diagnosis stands as the full story.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/conv_family_ablation_probe.py
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

    import fadtk_tpu.models.dac_impl as di
    import fadtk_tpu.models.encodec_impl as ei

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    # --- DAC (f32 pinned; bench geometry: 8 windows of 5 s @ 44.1k) ---
    from fadtk_tpu.models.dac_impl import DAC_44K, dac_encode, init_dac_params

    params = init_dac_params(DAC_44K, jax.random.PRNGKey(0))
    win = 220500  # bench geometry: 8 windows of 5 s
    x = jnp.asarray(rng.standard_normal((8, 1, win)) * 0.1, jnp.float32)

    orig_snake = di._snake

    def mk_dac():
        @jax.jit
        def step(acc, p, x):
            y = dac_encode(DAC_44K, p, x + acc * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        return step

    res = {}
    res["full"] = round(window_ms(mk_dac(), (params, x), rtt), 2)
    di._snake = lambda x, alpha: x
    res["no_snake"] = round(window_ms(mk_dac(), (params, x), rtt), 2)
    di._snake = orig_snake
    res["snake_delta"] = round(res["full"] - res["no_snake"], 2)
    out["dac-f32"] = res
    print(json.dumps({"dac-f32": res}), flush=True)

    # --- EnCodec 48k (bench geometry: 64 stereo 1 s segments) ---
    from fadtk_tpu.models.encodec_impl import (
        CONFIG_48K,
        encodec_encode,
        init_encodec_params,
    )

    orig_conv_layer = ei._conv_layer

    def conv_no_norm(cfg, p, x, k, stride, dil):
        # same conv/padding, but scale/shift without the (C, T) reduction
        saved = cfg
        import dataclasses

        cfg2 = dataclasses.replace(cfg, norm_type="weight_norm")
        y = orig_conv_layer(cfg2, p, x, k, stride, dil)
        if "norm_scale" in p:
            y = y * p["norm_scale"][None, :, None] + p["norm_bias"][None, :, None]
        del saved
        return y

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        eparams = jax.tree.map(
            lambda a: a.astype(dt)
            if a.dtype == jnp.float32
            else a,
            init_encodec_params(CONFIG_48K, jax.random.PRNGKey(0)),
        )
        seg = jnp.asarray(rng.standard_normal((64, 2, 48000)) * 0.1, jnp.float32)

        def mk_enc():
            @jax.jit
            def step(acc, p, x):
                y = encodec_encode(CONFIG_48K, p, (x + acc * 1e-12).astype(dt))
                return acc + y.astype(jnp.float32).sum()

            return step

        eres = {}
        ei._conv_layer = orig_conv_layer
        eres["full"] = round(window_ms(mk_enc(), (eparams, seg), rtt), 2)
        ei._conv_layer = conv_no_norm
        eres["no_norm"] = round(window_ms(mk_enc(), (eparams, seg), rtt), 2)
        ei._conv_layer = orig_conv_layer
        eres["norm_delta"] = round(eres["full"] - eres["no_norm"], 2)
        out[f"enc48-{dtype_name}"] = eres
        print(json.dumps({f"enc48-{dtype_name}": eres}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "conv_family_ablation.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
