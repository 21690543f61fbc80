"""Accounted-time ledgers for the attention families (round-5 verdict #1).

The conv families were closed with measured byte floors (PERF.md §3.4/§3.5);
the attention rows (clap-laion-audio 33%, clap-2023 32%, whisper-base 39%,
wavlm-base 44% of roofline) had only partial shares. This probe decomposes
each family's measured forward — INSIDE the production bench graph
(PERF.md §5 trap #4) — into:

  frontend_ms        measured: mel / conv-stack truncation variant
  mxu_ideal_tower_ms analytic: padded MXU-pass flops of every tower GEMM
                     (scripts/mxu_passes.py jaxpr walk) / measured tile rate
  d_softmax_ms       measured: jax.nn.softmax -> linear row scale (keeps
                     both attention GEMMs; removes only the VPU chain)
  d_gelu_ms          measured: GELU -> identity (keeps the FFN GEMMs;
                     whisper's frontend variant omits its conv GELUs so the
                     delta does not double-count them; speech patches the
                     FFN only for the same reason)
  d_ln_ms            measured: LayerNorm -> identity
  d_gate_ms          (wavlm) measured: gated relative position bias -> plain
                     attention (drops pb construction + gate proj + gate*pb)
  residual_ms        measured_full - all of the above: DMA, dispatch queue
                     gaps, non-back-to-back GEMM scheduling, and (wavlm bf16)
                     the flash kernel's in-kernel softmax chain

A row "closes" when accounted >= ~80% of measured. WavLM bf16's softmax
lives inside the Pallas kernel and cannot be ablated; the probe measures the
XLA-attention graph's softmax delta next to it as the comparable bound.

Every timing follows the honest tunneled protocol (probe_timing.py). Each
variant is one remote compile (~20-40 s, sometimes minutes); the script
prints per-variant progress and writes .bench_cache/attention_ledger.json.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/attention_ledger_probe.py [bf16|f32]
"""

from __future__ import annotations

import contextlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from mxu_passes import gemm_summary  # noqa: E402
from probe_timing import measure_rtt, window_ms  # noqa: E402


@contextlib.contextmanager
def patched(module, name, value):
    old = getattr(module, name)
    setattr(module, name, value)
    try:
        yield
    finally:
        setattr(module, name, old)


@contextlib.contextmanager
def env(name, value):
    old = os.environ.get(name)
    if value is None:
        os.environ.pop(name, None)
    else:
        os.environ[name] = value
    try:
        yield
    finally:
        if old is None:
            os.environ.pop(name, None)
        else:
            os.environ[name] = old


def make_step(fwd):
    import jax

    @jax.jit
    def step(acc, params, *inp):
        perturbed = (inp[0] * (1.0 + acc * 1e-30),) + tuple(inp[1:])
        return acc + fwd(params, *perturbed)

    return step


def linear_softmax(x, axis=-1, **kw):
    """Same-shape, GEMM-preserving softmax stand-in: one multiply instead of
    the max/sub/exp/sum/div chain. The -1e9 masks flow through harmlessly."""
    return x * (1.0 / x.shape[axis])


def measure(fwd, params, inputs, rtt) -> float:
    if os.environ.get("LEDGER_TRACE_ONLY"):
        # CPU smoke mode: validate every variant traces (symbols, shapes,
        # patches) without paying remote compiles; timings are dummies.
        # clear_caches: the trace cache keys on the fwd object, so a cached
        # jaxpr would skip re-tracing under the variant's monkeypatches.
        import jax

        jax.clear_caches()
        jax.eval_shape(fwd, params, *inputs)
        return 1.0
    return window_ms(make_step(fwd), (params, *inputs), rtt)


def main() -> None:
    dtype_name = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    import jax
    import jax.numpy as jnp

    import bench

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    roof_key = "bfloat16" if dtype_name == "bf16" else "float32"
    print(f"== attention ledger ({dtype_name}) ==", flush=True)

    if os.environ.get("LEDGER_TRACE_ONLY"):
        rtt, roof = 0.0, 194e12
    else:
        rtt = measure_rtt()
        print(f"rtt_ms={rtt*1e3:.1f}", flush=True)
        if rtt > 0.15:
            print("WARNING: tunnel RTT > 150 ms — congestion window, numbers suspect",
                  flush=True)
        roof = bench.measure_matmul_roofline(dtypes=(roof_key,), m=4096)[roof_key] * 1e12
        print(f"roofline_tfs={roof/1e12:.1f}", flush=True)

    cases = bench._family_cases()
    out = {"dtype": dtype_name, "rtt_ms": round(rtt * 1e3, 2),
           "roofline_tfs": round(roof / 1e12, 1)}

    import fadtk_tpu.models.htsat as ht
    import fadtk_tpu.models.precision as prec
    import fadtk_tpu.models.speech.encoder as enc
    import fadtk_tpu.models.whisper_impl as wh
    from fadtk_tpu.dsp.mel import torchlibrosa_log_mel

    # ---------------------------------------------------------------- CLAP
    def clap_ledger(name):
        fwd, params, inputs, _, _ = cases[name](dt)
        res = {}
        res["full_ms"] = measure(fwd, params, inputs, rtt)
        print(f"{name} full {res['full_ms']:.2f} ms", flush=True)

        if name == "clap-laion-audio":
            from fadtk_tpu.models.clap_laion import _MEL as MELKW
            melkw = dict(MELKW)
        else:
            from fadtk_tpu.models.clap_ms import _SR, _MelParams
            mp = _MelParams()
            melkw = dict(sr=_SR, n_fft=mp.n_fft, hop=mp.hop, n_mels=mp.n_mels,
                         fmin=mp.fmin, fmax=mp.fmax)

        def mel_only(p, chunks):
            return torchlibrosa_log_mel(chunks, **melkw).astype(jnp.float32).sum()

        res["frontend_ms"] = measure(mel_only, params, inputs, rtt)
        print(f"{name} mel_only {res['frontend_ms']:.2f} ms", flush=True)

        with patched(jax.nn, "softmax", linear_softmax):
            res["softmax_off_ms"] = measure(fwd, params, inputs, rtt)
        with patched(prec, "gelu", lambda x: x):
            res["gelu_off_ms"] = measure(fwd, params, inputs, rtt)
        with patched(ht, "_ln", lambda x, p, eps=1e-5: x):
            res["ln_off_ms"] = measure(fwd, params, inputs, rtt)

        full = gemm_summary(fwd, params, *inputs)
        front = gemm_summary(mel_only, params, *inputs)
        return finish(res, full, front)

    # ---------------------------------------------------------------- whisper
    def whisper_ledger():
        fwd, params, inputs, _, _ = cases["whisper-base"](dt)
        res = {}
        res["full_ms"] = measure(fwd, params, inputs, rtt)
        print(f"whisper-base full {res['full_ms']:.2f} ms", flush=True)

        from fadtk_tpu.models.whisper_impl import config_for_size
        cfg = config_for_size("base")

        def frontend(p, feats):
            # convs + positions, GELUs omitted (they are charged to
            # d_gelu_ms, whose patch covers them — no double count).
            x = feats.astype(dt).transpose(0, 2, 1)
            e = p["encoder"]
            x = jax.lax.conv_general_dilated(
                x, e["conv1"]["kernel"], (1,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=x.dtype) + e["conv1"]["bias"]
            x = jax.lax.conv_general_dilated(
                x, e["conv2"]["kernel"], (2,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=x.dtype) + e["conv2"]["bias"]
            x = x + e["embed_positions"][None, : x.shape[1]]
            return x.astype(jnp.float32).sum()

        res["frontend_ms"] = measure(frontend, params, inputs, rtt)
        print(f"whisper-base frontend {res['frontend_ms']:.2f} ms", flush=True)

        with patched(jax.nn, "softmax", linear_softmax):
            res["softmax_off_ms"] = measure(fwd, params, inputs, rtt)
        with patched(wh, "_gelu", lambda x: x):
            res["gelu_off_ms"] = measure(fwd, params, inputs, rtt)
        with patched(wh, "_ln", lambda x, p, eps: x):
            res["ln_off_ms"] = measure(fwd, params, inputs, rtt)

        full = gemm_summary(fwd, params, *inputs)
        front = gemm_summary(frontend, params, *inputs)
        return finish(res, full, front)

    # ---------------------------------------------------------------- wavlm
    def wavlm_ledger():
        fwd, params, inputs, _, _ = cases["wavlm-base"](dt)
        res = {}
        res["full_ms"] = measure(fwd, params, inputs, rtt)
        print(f"wavlm-base full {res['full_ms']:.2f} ms", flush=True)

        identity_layer = (
            lambda cfg, p, x, key_bias, position_bias, frame_valid=None: x
        )
        with patched(enc, "encoder_layer", identity_layer):
            res["frontend_ms"] = measure(fwd, params, inputs, rtt)
        print(f"wavlm-base frontend {res['frontend_ms']:.2f} ms", flush=True)

        def ff_nogelu(p, x):
            h = x @ p["intermediate_dense"]["kernel"] + p["intermediate_dense"]["bias"]
            return h @ p["output_dense"]["kernel"] + p["output_dense"]["bias"]

        with patched(enc, "_feed_forward", ff_nogelu):
            res["gelu_off_ms"] = measure(fwd, params, inputs, rtt)
        with patched(enc, "_layer_norm", lambda x, p, eps: x):
            res["ln_off_ms"] = measure(fwd, params, inputs, rtt)

        def no_gate_attn(cfg, p, x, key_bias, position_bias, frame_valid=None):
            q = x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
            k = x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
            v = x @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
            if x.dtype == jnp.bfloat16 and enc.use_flash_attention(x.dtype, frame_valid):
                from fadtk_tpu.ops.flash_attention import flash_attention_packed
                out = flash_attention_packed(q, k, v, frame_valid,
                                             num_heads=cfg.num_heads)
            else:
                qh, kh, vh = (enc._split_heads(y, cfg.num_heads) for y in (q, k, v))
                out = enc._attention_core(qh, kh, vh, key_bias)
            return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]

        with patched(enc, "wavlm_attention", no_gate_attn):
            res["gate_off_ms"] = measure(fwd, params, inputs, rtt)

        # XLA-attention variant: the comparable softmax delta (the production
        # bf16 softmax lives inside the Pallas kernel) + the jaxpr source for
        # the attention GEMMs.
        with env("FADTK_TPU_FLASH_ATTENTION", "0"):
            res["full_xla_ms"] = measure(fwd, params, inputs, rtt)
            with patched(jax.nn, "softmax", linear_softmax):
                res["softmax_off_xla_ms"] = measure(fwd, params, inputs, rtt)
            res["d_softmax_xla_ms"] = round(
                res["full_xla_ms"] - res["softmax_off_xla_ms"], 2
            )
            full = gemm_summary(fwd, params, *inputs)
            with patched(enc, "encoder_layer", identity_layer):
                front = gemm_summary(fwd, params, *inputs)
        if dtype_name != "bf16":
            # f32 production IS the XLA graph: the xla softmax delta is the
            # production delta (full_xla ~= full up to run-to-run noise).
            res["softmax_off_ms"] = res["softmax_off_xla_ms"]
        return finish(res, full, front, softmax_from=("d_softmax_xla_ms"
                      if dtype_name == "bf16" else None))

    # ---------------------------------------------------------------- ledger
    def finish(res, full_gemms, front_gemms, softmax_from=None):
        tower_padded = full_gemms["padded_tflop"] - front_gemms["padded_tflop"]
        tower_exact = full_gemms["exact_tflop"] - front_gemms["exact_tflop"]
        res["tower_padded_tflop"] = round(tower_padded, 4)
        res["tower_exact_tflop"] = round(tower_exact, 4)
        res["mxu_ideal_tower_ms"] = round(tower_padded * 1e12 / roof * 1e3, 2)

        full = res["full_ms"]
        deltas = {}
        if "softmax_off_ms" in res:
            deltas["d_softmax_ms"] = full - res["softmax_off_ms"]
        elif softmax_from:
            # in-kernel softmax: report the XLA-graph delta as the bound,
            # but do NOT add it to accounted (it belongs to the XLA graph).
            deltas["d_softmax_ms"] = 0.0
        if "gelu_off_ms" in res:
            deltas["d_gelu_ms"] = full - res["gelu_off_ms"]
        if "ln_off_ms" in res:
            deltas["d_ln_ms"] = full - res["ln_off_ms"]
        if "gate_off_ms" in res:
            deltas["d_gate_ms"] = full - res["gate_off_ms"]
        for k, v in deltas.items():
            res[k] = round(v, 2)

        accounted = (res["frontend_ms"] + res["mxu_ideal_tower_ms"]
                     + sum(max(v, 0.0) for v in deltas.values()))
        res["accounted_ms"] = round(accounted, 2)
        res["accounted_pct"] = round(accounted / full * 100, 1)
        res["residual_ms"] = round(full - accounted, 2)
        for k in ("full_ms", "frontend_ms", "softmax_off_ms", "gelu_off_ms",
                  "ln_off_ms", "gate_off_ms", "full_xla_ms",
                  "softmax_off_xla_ms"):
            if k in res:
                res[k] = round(res[k], 2)
        return res

    path = os.environ.get("LEDGER_OUT_DIR") or os.path.join(
        os.path.dirname(__file__), "..", ".bench_cache"
    )
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"attention_ledger_{dtype_name}.json")

    for name, runner in (
        ("clap-laion-audio", lambda: clap_ledger("clap-laion-audio")),
        ("clap-2023", lambda: clap_ledger("clap-2023")),
        ("whisper-base", whisper_ledger),
        ("wavlm-base", wavlm_ledger),
    ):
        out[name] = runner()
        print(json.dumps({name: out[name]}), flush=True)
        with open(fname, "w") as f:  # partial write per family: remote
            json.dump(out, f, indent=1)  # compiles can take minutes each

    print(json.dumps(out))


if __name__ == "__main__":
    main()
