"""Exact-GELU fusion probe: does composing 0.5*x*(1+erf(x/sqrt2)) by hand
avoid the extra HBM pass jax.nn.gelu(approximate=False) pays on TPU?

Calibration (scripts/transcendental_probe.py, 196M f32 elements, floor
1.10 ms): erf alone 1.65 ms, gelu_exact 3.16 ms — the 1.5 ms gap is ~one
full read+write of the tensor, i.e. the erf is NOT fusing into the gelu
chain. If a manual composition (same math, same erf) streams at ~1.7 ms,
the f32 speech/whisper GELU (52 of 300 ms on w2v2-base) shrinks by ~1/3
with BIT-IDENTICAL numerics candidates. This probe times the isolated
variants, checks bitwise equality against jax.nn.gelu, then A/Bs the
winner whole-model on w2v2-base f32.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gelu_fusion_probe.py
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
    from jax import lax

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    x = jnp.asarray(rng.standard_normal((128, 499, 3072)) * 2.0, jnp.float32)

    inv_sqrt2 = 0.7071067811865476

    def gelu_builtin(z):
        return jax.nn.gelu(z, approximate=False)

    def gelu_manual(z):
        return 0.5 * z * (1.0 + lax.erf(z * inv_sqrt2))

    def gelu_manual2(z):
        # multiply-by-half folded differently (one fewer broadcast constant)
        return z * (0.5 + 0.5 * lax.erf(z * inv_sqrt2))

    iso = {}
    for name, fn in (
        ("builtin", gelu_builtin),
        ("manual", gelu_manual),
        ("manual2", gelu_manual2),
    ):
        @jax.jit
        def step(acc, x, fn=fn):
            return acc + fn(x + acc * 1e-12).sum() * 1e-20

        iso[name] = round(window_ms(step, (x,), rtt), 2)
        print(json.dumps({name: iso[name]}), flush=True)
    out["isolated_ms"] = iso

    # numeric equality vs the builtin
    small = jnp.asarray(rng.standard_normal((4096,)) * 3.0, jnp.float32)
    ref = np.asarray(jax.jit(gelu_builtin)(small))
    for name, fn in (("manual", gelu_manual), ("manual2", gelu_manual2)):
        got = np.asarray(jax.jit(fn)(small))
        out[f"absdiff_{name}"] = float(np.abs(got - ref).max())
    print(json.dumps({k: v for k, v in out.items() if "absdiff" in k}), flush=True)

    # whole-model A/B: w2v2-base f32, builtin vs best manual
    import fadtk_tpu.models.precision as precision
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    cfg = SpeechEncoderConfig(do_normalize=False)
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((128, 160000)), jnp.float32) * 0.1
    nv = jnp.full((128,), 160000, jnp.int32)

    def mk():
        @jax.jit
        def step(acc, p, a, nv):
            states, _ = speech_encoder_forward(
                cfg, p, a + acc * 1e-12, nv, taps=(cfg.num_layers,)
            )
            return acc + states[0].astype(jnp.float32).sum()

        return step

    orig_gelu = precision.gelu
    res = {}
    res["builtin"] = round(window_ms(mk(), (params, audio, nv), rtt), 2)
    precision.gelu = lambda z: gelu_manual(z) if z.dtype == jnp.float32 else orig_gelu(z)
    res["manual"] = round(window_ms(mk(), (params, audio, nv), rtt), 2)
    precision.gelu = orig_gelu
    out["w2v2-f32"] = res
    print(json.dumps({"w2v2-f32": res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "gelu_fusion_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
