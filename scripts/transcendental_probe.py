"""Price the zoo's hot transcendentals on the TPU VPU (post-sin discovery).

DAC's 2.6x came from XLA:TPU's conservative `sin` (ops/fastmath.py). This
probe prices the other elementwise transcendentals the zoo runs at full
audio rate, isolated on a (128, 499, 3072) f32 tensor — elementwise streams
are HBM-floor ~1.5 GB r+w (~2 ms), so op-bound implementations stand out —
then whole-model ablations for the two candidates:

- erf (the f32 parity GELU; round-3 measured GELU at 52 of 300 ms w2v2-f32)
  vs a float32 polynomial erf candidate
- elu in EnCodec-24k (exp on the negative branch between every conv)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/transcendental_probe.py
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

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    x = jnp.asarray(rng.standard_normal((128, 499, 3072)) * 2.0, jnp.float32)

    def erf_poly(z):
        # Abramowitz-Stegun 7.1.26 (|abs err| < 1.5e-7) with exp
        s = jnp.sign(z)
        a = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * a)
        y = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429))))
        return s * (1.0 - y * jnp.exp(-a * a))

    ops = {
        "copy_mul2": lambda z: z * 2.0,
        "exp": jnp.exp,
        "tanh": jnp.tanh,
        "sin_xla": jnp.sin,
        "erf_xla": jax.scipy.special.erf,
        "erf_poly": erf_poly,
        "gelu_exact": lambda z: jax.nn.gelu(z, approximate=False),
        "gelu_tanh": lambda z: jax.nn.gelu(z, approximate=True),
        "elu": jax.nn.elu,
        "sigmoid": jax.nn.sigmoid,
    }
    iso = {}
    for name, fn in ops.items():
        @jax.jit
        def step(acc, x, fn=fn):
            return acc + fn(x + acc * 1e-12).sum() * 1e-20

        iso[name] = round(window_ms(step, (x,), rtt), 2)
        print(json.dumps({name: iso[name]}), flush=True)
    out["isolated_128x499x3072_f32_ms"] = iso

    # erf_poly accuracy (abs; erf output is in [-1, 1])
    z = np.linspace(-6, 6, 200001).astype(np.float32)
    import scipy.special as ss

    err = np.abs(np.asarray(erf_poly(jnp.asarray(z))) - ss.erf(z.astype(np.float64)))
    out["erf_poly_max_abs_err"] = float(err.max())
    print(json.dumps({"erf_poly_max_abs_err": out["erf_poly_max_abs_err"]}), flush=True)

    # ---- whole-model: EnCodec-24k elu -> identity ----
    import fadtk_tpu.models.encodec_impl as ei
    from fadtk_tpu.models.encodec_impl import (
        CONFIG_24K,
        encodec_encode,
        init_encodec_params,
    )

    eparams = init_encodec_params(CONFIG_24K, jax.random.PRNGKey(0))
    clips = jnp.asarray(rng.standard_normal((64, 1, 240000)) * 0.1, jnp.float32)

    def mk_enc():
        @jax.jit
        def step(acc, p, x):
            y = encodec_encode(CONFIG_24K, p, x + acc * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        return step

    orig_elu = jax.nn.elu
    res = {}
    res["full"] = round(window_ms(mk_enc(), (eparams, clips), rtt), 2)
    ei.jax.nn.elu = lambda z: z  # patch the module's view of jax.nn.elu
    res["no_elu"] = round(window_ms(mk_enc(), (eparams, clips), rtt), 2)
    ei.jax.nn.elu = orig_elu
    res["elu_delta"] = round(res["full"] - res["no_elu"], 2)
    out["enc24-f32"] = res
    print(json.dumps({"enc24-f32": res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "transcendental_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
