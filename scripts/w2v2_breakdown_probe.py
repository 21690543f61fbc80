"""Whole-model time breakdown for the w2v2-base forward on TPU.

Where do the non-roofline milliseconds go? The family sweep has w2v2-base at
~41% of the measured roofline in bf16 (221 ms/call at B=128x10s) and ~31% in
f32. Analytically the GEMM stack alone at the chained-probe 194 TF/s would be
~92 ms, so ~130 ms/call is elsewhere. This probe times the full forward and
ablated variants (serial stages, so subtraction is valid):

- full:        speech_encoder_forward taps=(12,)
- frontend:    conv feature extractor alone (36% of the model FLOPs:
               ~51 of 139 GFLOP/clip live in the 512ch k=3 conv stack)
- no_attn:     attention core replaced by identity (QKV/out GEMMs kept)
- no_ln:       every LayerNorm replaced by identity
- no_gelu:     every GELU replaced by identity

Timing: chained data dependency + one host value fetch, RTT subtracted
(probe_timing, CLAUDE.md protocol). CAUTION: ablation deltas guide where to
look; any default change still needs a whole-model A/B (bench.py families).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/w2v2_breakdown_probe.py
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

    import fadtk_tpu.models.precision as precision
    import fadtk_tpu.models.speech.encoder as enc
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig

    cfg = SpeechEncoderConfig(do_normalize=False)
    b, sec, sr = 128, 10, 16000
    rng = np.random.default_rng(0)
    audio_np = (rng.standard_normal((b, sec * sr)) * 0.1).astype(np.float32)
    nv_np = np.full((b,), sec * sr, np.int32)

    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "geometry": f"B={b} {sec}s w2v2-base"}

    orig_attention_core = enc._attention_core
    orig_layer_norm = enc._layer_norm
    orig_gelu = precision.gelu
    import fadtk_tpu.ops.flash_attention  # noqa: F401  (ops/__init__ re-export shadows the name)

    fa = sys.modules["fadtk_tpu.ops.flash_attention"]
    orig_flash = fa.flash_attention

    def identity_attention_core(q, k, v, bias):
        bb, h, t, d = v.shape
        return v.transpose(0, 2, 1, 3).reshape(bb, t, h * d)

    def identity_flash(q, k, v, nv, **kw):
        return v

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        params = jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
            enc.init_speech_encoder_params(cfg, jax.random.PRNGKey(0)),
        )
        audio = jnp.asarray(audio_np)
        nv = jnp.asarray(nv_np)
        res: dict = {}

        def timeit(fwd):
            # params as an ARGUMENT — closing over them embeds 95M weights as
            # jit constants (the f32 HLO then exceeds the remote compile
            # service's request size limit: HTTP 413).
            @jax.jit
            def step(acc, p, a, n):
                aa = a * (1.0 + acc * 1e-30)
                return acc + fwd(p, aa, n)

            return window_ms(step, (params, audio, nv), rtt)

        def full_fwd(p, a, n):
            states, _ = enc.speech_encoder_forward(
                cfg, p, a.astype(dt), n, taps=(cfg.num_layers,)
            )
            return states[0].astype(jnp.float32).sum()

        def frontend_fwd(p, a, n):
            feats, mask, fv = jax.vmap(
                lambda x, v: enc._feature_extractor_single(
                    cfg, p["feature_extractor"], x.astype(dt), v
                )
            )(a, n)
            return feats.astype(jnp.float32).sum()

        res["full_ms"] = round(timeit(full_fwd), 2)
        res["frontend_ms"] = round(timeit(frontend_fwd), 2)

        fa.flash_attention = identity_flash
        enc._attention_core = identity_attention_core
        try:
            res["no_attn_ms"] = round(timeit(full_fwd), 2)
        finally:
            fa.flash_attention = orig_flash
            enc._attention_core = orig_attention_core

        enc._layer_norm = lambda x, p, eps: x
        try:
            res["no_ln_ms"] = round(timeit(full_fwd), 2)
        finally:
            enc._layer_norm = orig_layer_norm

        precision.gelu = lambda x: x
        try:
            res["no_gelu_ms"] = round(timeit(full_fwd), 2)
        finally:
            precision.gelu = orig_gelu

        res["attn_cost_ms"] = round(res["full_ms"] - res["no_attn_ms"], 2)
        res["ln_cost_ms"] = round(res["full_ms"] - res["no_ln_ms"], 2)
        res["gelu_cost_ms"] = round(res["full_ms"] - res["no_gelu_ms"], 2)
        res["encoder_residual_ms"] = round(
            res["full_ms"]
            - res["frontend_ms"]
            - res["attn_cost_ms"]
            - res["ln_cost_ms"]
            - res["gelu_cost_ms"],
            2,
        )
        out[dtype_name] = res
        print(json.dumps({dtype_name: res}), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache", "w2v2_breakdown.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
