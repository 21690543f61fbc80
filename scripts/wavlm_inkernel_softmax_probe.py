"""Close the wavlm-base ledger row: measure the flash kernel's IN-KERNEL
softmax chain, which the main ledger (scripts/attention_ledger_probe.py)
cannot ablate (it lives inside the Pallas kernel) and therefore leaves in
the residual (bf16 row: 77.6% accounted, 23.4 ms residual).

Derivation, all inside the production bench graph:

  d_attn_core = full - attn_core_off     (attn_core_off keeps the q/k/v/out
                                          projection GEMMs, replaces the
                                          kernel call with out = v)
  d_gate      = full - gate_off          (same variant as the main ledger,
                                          re-measured in THIS run so the
                                          subtraction is same-day)
  logits_av_ideal = padded-pass flops of the logits+av GEMMs (jaxpr diff of
                    the XLA-attention graph with/without the core) / roofline
  in_kernel_chain ~= d_attn_core - d_gate - logits_av_ideal

`in_kernel_chain` is the measured VPU cost of the kernel's online softmax +
accumulator chain (PERF.md §3.3: ~6 elementwise/reduction passes per
(BQ, BK) f32 tile per head) plus its DMA residual. Added to the ledger it
closes the row: accounted = frontend + mxu_ideal_tower + d_gelu + d_ln +
d_gate + in_kernel_chain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wavlm_inkernel_softmax_probe.py
"""

from __future__ import annotations

import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from attention_ledger_probe import env, make_step, patched  # noqa: E402
from mxu_passes import gemm_summary  # noqa: E402
from probe_timing import measure_rtt, window_ms  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    import fadtk_tpu.models.speech.encoder as enc

    rtt = measure_rtt()
    roof = bench.measure_matmul_roofline(dtypes=("bfloat16",), m=4096)["bfloat16"] * 1e12
    print(f"rtt_ms={rtt*1e3:.1f} roofline_tfs={roof/1e12:.1f}", flush=True)

    fwd, params, inputs, _, _ = bench._family_cases()["wavlm-base"](jnp.bfloat16)

    def measure():
        return window_ms(make_step(fwd), (params, *inputs), rtt)

    out = {"rtt_ms": round(rtt * 1e3, 2), "roofline_tfs": round(roof / 1e12, 1)}
    out["full_ms"] = round(measure(), 2)
    print(f"full {out['full_ms']} ms", flush=True)

    def no_gate_attn(cfg, p, x, key_bias, position_bias, frame_valid=None):
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
        v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        from fadtk_tpu.ops.flash_attention import flash_attention_packed

        out_ = flash_attention_packed(q, k, v, frame_valid, num_heads=cfg.num_heads)
        return out_ @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    def core_off_attn(cfg, p, x, key_bias, position_bias, frame_valid=None):
        # Keeps all four projection GEMMs; removes logits/av GEMMs, the
        # softmax chain, the gate projection and the position bias.
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
        v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        out_ = v + 0.0 * (q + k)  # keep q/k live so XLA cannot DCE them
        return out_ @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    with patched(enc, "wavlm_attention", no_gate_attn):
        out["gate_off_ms"] = round(measure(), 2)
    print(f"gate_off {out['gate_off_ms']} ms", flush=True)
    with patched(enc, "wavlm_attention", core_off_attn):
        out["attn_core_off_ms"] = round(measure(), 2)
    print(f"attn_core_off {out['attn_core_off_ms']} ms", flush=True)

    # logits+av padded-pass ideal: jaxpr diff on the XLA-attention graph.
    with env("FADTK_TPU_FLASH_ATTENTION", "0"):
        with patched(enc, "wavlm_attention", no_gate_attn_xla(enc)):
            g_plain = gemm_summary(fwd, params, *inputs)
        with patched(enc, "wavlm_attention", core_off_attn):
            g_core_off = gemm_summary(fwd, params, *inputs)
    logits_av_tf = g_plain["padded_tflop"] - g_core_off["padded_tflop"]
    out["logits_av_padded_tflop"] = round(logits_av_tf, 4)
    out["logits_av_ideal_ms"] = round(logits_av_tf * 1e12 / roof * 1e3, 2)

    out["d_gate_ms"] = round(out["full_ms"] - out["gate_off_ms"], 2)
    out["d_attn_core_ms"] = round(out["full_ms"] - out["attn_core_off_ms"], 2)
    out["in_kernel_chain_ms"] = round(
        out["d_attn_core_ms"] - out["d_gate_ms"] - out["logits_av_ideal_ms"], 2
    )
    print(json.dumps(out), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "wavlm_inkernel_softmax.json"), "w") as f:
        json.dump(out, f, indent=1)


def no_gate_attn_xla(enc):
    """Plain (ungated, unbiased) attention on the XLA path — the GEMM-set
    twin of the flash no_gate variant, used only for jaxpr counting."""

    def attn(cfg, p, x, key_bias, position_bias, frame_valid=None):
        q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
        k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
        v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
        qh, kh, vh = (enc._split_heads(y, cfg.num_heads) for y in (q, k, v))
        out_ = enc._attention_core(qh, kh, vh, key_bias)
        return out_ @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

    return attn


if __name__ == "__main__":
    main()
