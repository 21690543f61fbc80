"""Measure the masked-block skip in the flash kernel at a ragged batch.

One executable, two inputs: a full-length batch (every kv/q block computed)
vs a ragged batch (clips ~30% of the bucket -> blocks beyond n_valid skip
compute AND DMA via the clamped index maps). Before round 3 the two ran in
identical time; with the skip, attention work scales ~ ceil(nv/block)^2.

Shape: w2v2-base bf16 at the 20 s bucket (T=999 -> two 512-blocks per axis),
where a 6 s clip leaves only block 0 live. Timing = the repo's honest
tunneled-device protocol (chained data dependency, one host value fetch,
RTT subtracted) — see bench.py and CLAUDE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flash_skip_probe.py
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

    from fadtk_tpu.models.precision import cast_params_bf16
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    cfg = SpeechEncoderConfig(do_normalize=False)
    params = cast_params_bf16(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)))

    b, sr, seconds = 64, 16000, 20  # 20 s bucket: T=999 -> 2x512 blocks
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((b, seconds * sr)) * 0.1), jnp.bfloat16
    )

    def fwd(p, a, nv):
        states, mask = speech_encoder_forward(cfg, p, a, nv, taps=(cfg.num_layers,))
        return (states[0].astype(jnp.float32) * mask[..., None]).sum()

    def step(p, acc, a, nv):
        return acc + fwd(p, a * (1.0 + acc * 1e-30).astype(a.dtype), nv)

    jstep = jax.jit(lambda acc, a, nv: step(params, acc, a, nv))
    rtt = measure_rtt()

    out = {"batch": b, "bucket_seconds": seconds, "frames": 999, "rtt_ms": rtt * 1e3}
    for name, nv_sec in (("full_20s", seconds), ("ragged_6s", 6)):
        nv = jnp.full((b,), nv_sec * sr, jnp.int32)
        out[name + "_ms_per_call"] = round(
            window_ms(jstep, (audio, nv), rtt, budget_s=0.5), 2
        )

    out["speedup_ragged_vs_full"] = round(
        out["full_20s_ms_per_call"] / out["ragged_6s_ms_per_call"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
