"""Whole-model A/B on TPU: speech-family f32 attention, XLA vs PACKED flash.

Context: the f32 flash experiment was declared a whole-model dead end (MERT
f32 455.9 ms flash vs 431.4 ms XLA, -5.7% — encoder.py::use_flash_attention
docstring), but that A/B ran the per-(b,h) kernel + 4 head transposes. The
packed-heads kernel then measured 12.63 -> 7.79 ms at the f32 T=499
call-site boundary (scripts/flash_packed_probe.py) — a 1.6x kernel-side
shift that could flip the whole-model verdict. This probe re-runs the
whole-model f32 A/B through the production routing (FADTK_TPU_FLASH_F32=1
now routes to flash_attention_packed in standard_attention):

- w2v2-base geometry: B=128, 10 s @ 16 kHz (T=499)
- MERT geometry:      B=128, 10 s @ 24 kHz (T=749) — the prior dead end

Protocol: chained data dependency + one host value fetch, RTT subtracted
(probe_timing, CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/speech_flash_f32_probe.py
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

    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    cases = {
        # (sample_rate, seconds, batch)
        "w2v2-base-T499": (16000, 10, 128),
        "mert-T749": (24000, 10, 128),
    }

    for name, (sr, sec, b) in cases.items():
        cfg = SpeechEncoderConfig(do_normalize=False)
        params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
        audio = jnp.asarray(rng.standard_normal((b, sec * sr)), jnp.float32) * 0.1
        nv = jnp.full((b,), sec * sr, jnp.int32)

        def make_step():
            @jax.jit
            def step(acc, p, audio, nv):
                states, _ = speech_encoder_forward(
                    cfg, p, audio + acc * 1e-12, nv, taps=(cfg.num_layers,)
                )
                return acc + states[0].astype(jnp.float32).sum()

            return step

        os.environ.pop("FADTK_TPU_FLASH_F32", None)
        ms_xla = window_ms(make_step(), (params, audio, nv), rtt)

        os.environ["FADTK_TPU_FLASH_F32"] = "1"
        os.environ["FADTK_TPU_FLASH_F32_MIN_T"] = "256"
        ms_flash = window_ms(make_step(), (params, audio, nv), rtt)
        os.environ.pop("FADTK_TPU_FLASH_F32", None)
        os.environ.pop("FADTK_TPU_FLASH_F32_MIN_T", None)

        out[name] = {
            "xla_ms": round(ms_xla, 2),
            "flash_packed_ms": round(ms_flash, 2),
            "speedup": round(ms_xla / ms_flash, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "speech_flash_f32.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
