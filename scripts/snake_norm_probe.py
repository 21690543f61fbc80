"""Snake / time-group-norm variants on TPU (whole-model DAC and EnCodec-48k).

The conv-family ablation (scripts/conv_family_ablation_probe.py) overturned
the "near the conv roofline" diagnosis: DAC's snake activation is 55.7 of
86.0 ms (65% — the conv stack alone is 30.3 ms) and EnCodec-48k's
time_group_norm is 9.7 of 21.9 ms bf16 / 22.9 of 37.6 f32. This probe prices
the cheap algebraic variants:

DAC snake (f32, the family's pinned dtype):
- div:        current `x + sin^2(ax) / (a + 1e-9)` (elementwise divide)
- recip:      `x + reciprocal(a + 1e-9) * sin^2(ax)` — per-CHANNEL reciprocal
              hoisted out of the elementwise chain; this is literally what
              descript-audio-codec computes (torch mirror in tests/test_dac.py:33)
- poly:       recip + a plain-jnp Cody-Waite sin: z reduced to [-pi, pi]
              (args are a*x, O(10)), degree-9 odd minimax polynomial —
              bounds what a cheaper sin could buy
- none:       identity (floor)

EnCodec-48k time_group_norm (both dtypes):
- twopass:    current jnp.mean + jnp.var (var re-derives the mean)
- onepass:    m1 = mean(y), m2 = mean(y*y), var = m2 - m1^2 (single
              traversal if XLA fuses the two reduces; torch's own
              group_norm uses the one-pass moments form)
- none:       scale/shift only (floor)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/snake_norm_probe.py
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

    # ---------------- DAC snake variants ----------------
    from fadtk_tpu.models.dac_impl import DAC_44K, dac_encode, init_dac_params

    params = init_dac_params(DAC_44K, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((8, 1, 220500)) * 0.1, jnp.float32)

    def snake_div(x, alpha):
        a = alpha[None, :, None]
        return x + jnp.square(jnp.sin(a * x)) / (a + 1e-9)

    def snake_recip(x, alpha):
        inv = 1.0 / (alpha + 1e-9)
        a = alpha[None, :, None]
        return x + inv[None, :, None] * jnp.square(jnp.sin(a * x))

    def _fast_sin(z):
        # Cody-Waite reduction to [-pi, pi] then odd minimax poly (deg 9).
        two_pi = 6.283185307179586
        z = z - two_pi * jnp.round(z * (1.0 / two_pi))
        # fold |z| > pi/2 onto the principal branch: sin(z) = sin(pi - z)
        pi = 3.141592653589793
        z = jnp.where(z > pi / 2, pi - z, z)
        z = jnp.where(z < -pi / 2, -pi - z, z)
        z2 = z * z
        # minimax coefficients for sin on [-pi/2, pi/2] (float32-accurate)
        p = -2.3828544692960918e-8
        p = p * z2 + 2.7521557770526783e-6
        p = p * z2 - 1.9840782426250314e-4
        p = p * z2 + 8.3333303183525942e-3
        p = p * z2 - 1.6666666601721269e-1
        return z + z * z2 * p

    def snake_poly(x, alpha):
        inv = 1.0 / (alpha + 1e-9)
        a = alpha[None, :, None]
        return x + inv[None, :, None] * jnp.square(_fast_sin(a * x))

    def mk_dac():
        @jax.jit
        def step(acc, p, x):
            y = dac_encode(DAC_44K, p, x + acc * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        return step

    res = {}
    for name, fn in (
        ("div", snake_div),
        ("recip", snake_recip),
        ("poly", snake_poly),
        ("none", lambda x, alpha: x),
    ):
        di._snake = fn
        res[name] = round(window_ms(mk_dac(), (params, x), rtt), 2)
        print(json.dumps({"dac-f32": {name: res[name]}}), flush=True)
    di._snake = snake_div
    out["dac-f32"] = res

    # numeric deltas of the variants vs div (whole model, same inputs)
    di._snake = snake_div
    ref = np.asarray(jax.jit(lambda p, x: dac_encode(DAC_44K, p, x))(params, x))
    for name, fn in (("recip", snake_recip), ("poly", snake_poly)):
        di._snake = fn
        got = np.asarray(jax.jit(lambda p, x: dac_encode(DAC_44K, p, x))(params, x))
        out[f"dac_absdiff_{name}"] = float(np.abs(got - ref).max())
    di._snake = snake_div
    print(json.dumps({k: v for k, v in out.items() if "absdiff" in k}), flush=True)

    # ---------------- EnCodec-48k norm variants ----------------
    from fadtk_tpu.models.encodec_impl import (
        CONFIG_48K,
        encodec_encode,
        init_encodec_params,
    )

    orig_conv_layer = ei._conv_layer

    def conv_layer_onepass(cfg, p, x, k, stride, dil):
        import dataclasses

        cfg2 = dataclasses.replace(cfg, norm_type="weight_norm")
        y = orig_conv_layer(cfg2, p, x, k, stride, dil)
        if cfg.norm_type == "time_group_norm":
            m1 = jnp.mean(y, axis=(1, 2), keepdims=True)
            m2 = jnp.mean(y * y, axis=(1, 2), keepdims=True)
            var = m2 - m1 * m1
            y = (y - m1) * jax.lax.rsqrt(var + 1e-5)
            y = y * p["norm_scale"][None, :, None] + p["norm_bias"][None, :, None]
        return y

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        eparams = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
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
        eres["twopass"] = round(window_ms(mk_enc(), (eparams, seg), rtt), 2)
        ei._conv_layer = conv_layer_onepass
        eres["onepass"] = round(window_ms(mk_enc(), (eparams, seg), rtt), 2)
        ei._conv_layer = orig_conv_layer
        out[f"enc48-{dtype_name}"] = eres
        print(json.dumps({f"enc48-{dtype_name}": eres}), flush=True)

    # numeric delta of onepass vs twopass (f32)
    eparams = init_encodec_params(CONFIG_48K, jax.random.PRNGKey(0))
    seg = jnp.asarray(rng.standard_normal((8, 2, 48000)) * 0.1, jnp.float32)
    ei._conv_layer = orig_conv_layer
    ref = np.asarray(jax.jit(lambda p, x: encodec_encode(CONFIG_48K, p, x))(eparams, seg))
    ei._conv_layer = conv_layer_onepass
    got = np.asarray(jax.jit(lambda p, x: encodec_encode(CONFIG_48K, p, x))(eparams, seg))
    ei._conv_layer = orig_conv_layer
    out["enc48_absdiff_onepass"] = float(np.abs(got - ref).max())
    print(json.dumps({"enc48_absdiff_onepass": out["enc48_absdiff_onepass"]}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "snake_norm_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
