"""EnCodec-24k: k=1 convs as einsum GEMMs — cheap partial fix probe.

The stage ablation (scripts/encodec_stage_probe.py) put the two early
resnet blocks at 60% of the model (21.3 + 24.2 ms f32). Each resnet is
[elu, conv k=3 C->C/2, elu, conv k=1 C/2->C, shortcut conv k=1 C->C, add];
two of its three convs are k=1 — i.e. plain (C_out, C_in) matmuls over T —
and XLA's TPU *conv* path measured ~2.4x over the HBM floor at these
shapes. This probe lowers ONLY k=1/stride=1/dil=1 convs through einsum
(the general gemm lowering whole-model was a dead end, but that verdict
bundled the k-fold im2col patch tensor of the k>1 layers — k=1 has no
patch tensor at all, so the dead end does not transfer).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/encodec_k1_einsum_probe.py
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

    import fadtk_tpu.ops.conv1d as c1
    from fadtk_tpu.models.encodec_impl import (
        CONFIG_24K,
        encodec_encode,
        init_encodec_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    params = init_encodec_params(CONFIG_24K, jax.random.PRNGKey(0))
    clips = jnp.asarray(rng.standard_normal((64, 1, 240000)) * 0.1, jnp.float32)

    orig = c1.conv1d_ncl

    def conv1d_k1_einsum(x, w, stride=1, dilation=1, lowering=None):
        cout, cin, k = w.shape
        if k == 1 and stride == 1 and dilation == 1:
            return jnp.einsum(
                "bct,oc->bot", x, w[:, :, 0], preferred_element_type=x.dtype
            )
        return orig(x, w, stride=stride, dilation=dilation, lowering=lowering)

    def mk():
        @jax.jit
        def step(acc, p, x):
            y = encodec_encode(CONFIG_24K, p, x + acc * 1e-12)
            return acc + y.astype(jnp.float32).sum()

        return step

    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        p = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
        res = {}
        c1.conv1d_ncl = orig
        import fadtk_tpu.models.encodec_impl as ei  # conv1d_ncl imported inside _conv_layer

        res["conv"] = round(window_ms(mk(), (p, clips), rtt), 2)
        c1.conv1d_ncl = conv1d_k1_einsum
        res["k1_einsum"] = round(window_ms(mk(), (p, clips), rtt), 2)
        c1.conv1d_ncl = orig
        res["speedup"] = round(res["conv"] / res["k1_einsum"], 3)
        out[f"enc24-{dtype_name}"] = res
        print(json.dumps({f"enc24-{dtype_name}": res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "encodec_k1_einsum.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
