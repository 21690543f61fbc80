"""Close the speech conv-frontend row with the §3.4/§3.5 floor standard.

The round-5 attention ledgers (ATTENTION_LEDGER_r05.json) account
wavlm-base's frontend as a MEASURED 25.21 ms truncation variant and PERF.md
calls it "HBM-bound §3.4-class" — an assertion carried since round 2, never
measured. Unlike the EnCodec/DAC/CDPAM chains (C = 32-64, lane-starved, §3.4
/§3.5), this stack contracts K = k·512 ≥ 1024 after layer 0 — FULL MXU lane
fill — so the envelope arithmetic says the conv chain is *pass-bound*, not
byte-bound. This probe settles it with both floors computed against same-day
measured rates, plus a per-depth truncation sweep that attributes the
residual layer by layer:

  mxu_ideal_ms    padded MXU-pass flops of the frontend-only graph
                  (scripts/mxu_passes.py jaxpr walk — the ledger's own
                  walker) / same-day measured matmul tile rate;
  byte_floor_ms   ideal-fusion single-pass traffic — every intermediate
                  written once + read once, norms/GELUs fused, weights read
                  once — / same-day measured stream bandwidth
                  (scripts/encodec_byte_floor.py protocol);
  convchain(d)    measured ms of the first d conv layers alone (vmapped
                  truncated extractor, production audio argument) — the
                  marginal cost of layer d vs its per-layer ideals.

The frontend graph here is exactly the ledger's encoder_layer→identity
variant: conv extractor + projection LN/GEMM + positional conv. Reference
forwards this accounts for: /root/reference/fadtk/model_loader.py:553-558
(w2v2), :621-633 (wavlm) — the HF Wav2Vec2FeatureEncoder conv stack.

Primary mode is bf16 (the family-table pct rows, PERF.md §2). The f32 mode
measures frontend + full conv chain only (no depth sweep): f32 doubles the
byte floor at unchanged flops, which flips the predicted bind to HBM —
worth one measurement to pin that the "HBM-bound" wording was right for
the f32 parity path and wrong for the bf16 throughput path.

Every timing follows the honest tunneled protocol (probe_timing.py).
Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/speech_frontend_floor_probe.py [bf16|f32]
"""

from __future__ import annotations

import contextlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from encodec_byte_floor import measure_stream_bw  # noqa: E402
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


def make_step(fwd):
    import jax

    @jax.jit
    def step(acc, params, *inp):
        return acc + fwd(params, *inp) * (1.0 + acc * 1e-30)

    return step


def measure(fwd, params, inputs, rtt) -> float:
    if os.environ.get("LEDGER_TRACE_ONLY"):
        import jax

        jax.clear_caches()
        jax.eval_shape(fwd, params, *inputs)
        return 1.0
    return window_ms(make_step(fwd), (params, *inputs), rtt)


def frontend_floors(cfg, b: int, t_samples: int, itemsize: int) -> dict:
    """Analytic per-layer floors for the frontend-only graph.

    Byte convention (single-pass, §3.5 after advisor finding #1): every
    intermediate crosses HBM once as a write and once as the next consumer's
    read; weights read once; norms/GELU fused free. MXU convention: padded
    (128,128,128) passes at the walker's im2col model.
    """
    c = lambda d: -(-d // 128)  # ceil tiles
    tile_flops = 2 * 128**3

    rows = []
    t, c_in = t_samples, 1
    conv_bytes = b * t_samples * itemsize  # model input read
    conv_pad_flops = 0.0
    for i, (k, s, c_out) in enumerate(
        zip(cfg.conv_kernel, cfg.conv_stride, cfg.conv_dim)
    ):
        t_out = (t - k) // s + 1
        pad = c(b * t_out) * c(k * c_in) * c(c_out) * tile_flops
        byt = b * c_out * t_out * itemsize * 2 + k * c_in * c_out * itemsize
        if i == len(cfg.conv_kernel) - 1:
            byt -= b * c_out * t_out * itemsize  # last read charged to proj row
        rows.append(
            {
                "layer": f"conv{i} {c_in}->{c_out} k{k} s{s} T{t}->{t_out}",
                "mxu_ideal_tflop": round(pad / 1e12, 4),
                "bytes_MB": round(byt / 1e6, 1),
            }
        )
        conv_pad_flops += pad
        conv_bytes += byt
        t, c_in = t_out, c_out

    # feature projection (C_last -> hidden) + positional grouped conv
    h = cfg.hidden_size
    proj_pad = c(b * t) * c(c_in) * c(h) * tile_flops
    proj_bytes = (
        b * t * c_in * itemsize  # read conv output
        + b * t * h * itemsize  # write projected
        + c_in * h * itemsize
    )
    g = cfg.num_conv_pos_embedding_groups
    kp = cfg.num_conv_pos_embeddings
    pos_pad = g * c(b * t) * c(kp * h // g) * c(h // g) * tile_flops
    pos_bytes = 2 * b * t * h * itemsize + kp * (h // g) * h * itemsize
    rows.append(
        {
            "layer": f"feature_projection {c_in}->{h}",
            "mxu_ideal_tflop": round(proj_pad / 1e12, 4),
            "bytes_MB": round(proj_bytes / 1e6, 1),
        }
    )
    rows.append(
        {
            "layer": f"pos_conv k{kp} g{g}",
            "mxu_ideal_tflop": round(pos_pad / 1e12, 4),
            "bytes_MB": round(pos_bytes / 1e6, 1),
        }
    )
    return {
        "rows": rows,
        "conv_pad_tflop": conv_pad_flops / 1e12,
        "conv_bytes": conv_bytes,
        "total_pad_tflop": (conv_pad_flops + proj_pad + pos_pad) / 1e12,
        "total_bytes": conv_bytes + proj_bytes + pos_bytes,
    }


def main() -> None:
    dtype_name = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    import jax

    if os.environ.get("LEDGER_TRACE_ONLY"):
        # CPU smoke: the axon site hook re-pins JAX_PLATFORMS at import, and
        # building the bench cases on the tunneled device would ship ~500 MB
        # of params/audio through a 44 MB/s link just to eval_shape them.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    import bench
    import fadtk_tpu.models.speech.encoder as enc

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    roof_key = "bfloat16" if dtype_name == "bf16" else "float32"
    itemsize = 2 if dtype_name == "bf16" else 4
    print(f"== speech conv-frontend floors ({dtype_name}) ==", flush=True)

    if os.environ.get("LEDGER_TRACE_ONLY"):
        rtt, roof, bw = 0.0, 194e12, 618e9
    else:
        rtt = measure_rtt()
        print(f"rtt_ms={rtt*1e3:.1f}", flush=True)
        roof = bench.measure_matmul_roofline(dtypes=(roof_key,), m=4096)[
            roof_key
        ] * 1e12
        print(f"roofline_tfs={roof/1e12:.1f}", flush=True)
        bw = measure_stream_bw(roof_key) * 1e9  # helper returns GB/s
        print(f"stream_bw_GBps={bw/1e9:.0f}", flush=True)

    cases = bench._family_cases()
    out = {
        "note": (
            "Floors for the speech conv frontend (the last unbounded ledger "
            "term). Conventions: byte floor = single-pass ideal fusion "
            "(write+read each intermediate once, norms/GELU fused, weights "
            "once); MXU ideal = padded-pass jaxpr walk / same-day tile rate. "
            "convchain(d) = measured first-d-conv-layers truncation. PERF.md "
            "3.7 interprets."
        ),
        "dtype": dtype_name,
        "rtt_ms": round(rtt * 1e3, 2),
        "roofline_tfs": round(roof / 1e12, 1),
        "stream_bw_GBps": round(bw / 1e9, 1),
    }

    identity_layer = lambda cfg, p, x, key_bias, position_bias, frame_valid=None: x

    path = os.environ.get("LEDGER_OUT_DIR") or os.path.join(
        os.path.dirname(__file__), "..", ".bench_cache"
    )
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"speech_frontend_floor_{dtype_name}.json")

    fams = (
        (("wavlm-base", True), ("w2v2-base", False))
        if dtype_name == "bf16"
        else (("wavlm-base", False),)  # f32: bind-flip check only
    )
    for fam, depth_sweep in fams:
        fwd, params, inputs, _, _ = cases[fam](dt)
        audio, nv = inputs
        b, t_samples = audio.shape

        from fadtk_tpu.models.speech.config import SpeechEncoderConfig

        cfg = SpeechEncoderConfig(
            do_normalize=False,
            **({"attention_type": "wavlm"} if fam == "wavlm-base" else {}),
        )
        res: dict = {"batch": b, "t_samples": t_samples}

        # -- measured: full frontend (the ledger's encoder_layer->identity)
        with patched(enc, "encoder_layer", identity_layer):
            res["frontend_ms"] = round(measure(fwd, params, inputs, rtt), 2)
            fsum = gemm_summary(fwd, params, *inputs)
        print(f"{fam} frontend {res['frontend_ms']} ms", flush=True)

        # -- measured: conv-chain truncation sweep
        def convchain_fwd(depth):
            def f(p, audio, nv):
                def single(a, v):
                    x = a.astype(dt)[None, :, None]
                    valid, t = v, x.shape[1]
                    for i in range(depth):
                        layer = p["feature_extractor"]["conv_layers"][i]
                        k, s = cfg.conv_kernel[i], cfg.conv_stride[i]
                        x = enc._conv1d(
                            x, layer["conv"]["kernel"], s, layer["conv"].get("bias")
                        )
                        valid = (valid - k) // s + 1
                        t = x.shape[1]
                        mask = (jnp.arange(t) < valid).astype(x.dtype)[None, :]
                        if cfg.feat_extract_norm == "group" and i == 0:
                            x = enc._masked_group_norm_per_channel(
                                x, mask, layer["layer_norm"]
                            )
                        x = enc._gelu(x)
                    return x[0]

                return jax.vmap(single)(audio, nv).astype(jnp.float32).sum()

            return f

        n_conv = len(cfg.conv_kernel)
        depths = range(1, n_conv + 1) if depth_sweep else (n_conv,)
        chain = {}
        for d in depths:
            chain[d] = round(measure(convchain_fwd(d), params, inputs, rtt), 2)
            print(f"{fam} convchain({d}) {chain[d]} ms", flush=True)
        res["convchain_ms"] = {str(d): v for d, v in chain.items()}

        # -- analytic floors
        fl = frontend_floors(cfg, b, t_samples, itemsize)
        res["per_layer"] = fl["rows"]
        res["walker_padded_tflop"] = round(fsum["padded_tflop"], 4)
        res["analytic_padded_tflop"] = round(fl["total_pad_tflop"], 4)
        res["mxu_ideal_ms"] = round(fl["total_pad_tflop"] * 1e12 / roof * 1e3, 2)
        res["mxu_ideal_conv_ms"] = round(fl["conv_pad_tflop"] * 1e12 / roof * 1e3, 2)
        res["byte_floor_ms"] = round(fl["total_bytes"] / bw * 1e3, 2)
        res["byte_floor_conv_ms"] = round(fl["conv_bytes"] / bw * 1e3, 2)
        bind = "mxu" if res["mxu_ideal_ms"] > res["byte_floor_ms"] else "hbm"
        res["bind"] = bind
        floor = max(res["mxu_ideal_ms"], res["byte_floor_ms"])
        res["vs_floor"] = round(res["frontend_ms"] / floor, 2) if floor else None
        conv_floor = max(res["mxu_ideal_conv_ms"], res["byte_floor_conv_ms"])
        res["convchain_vs_conv_floor"] = (
            round(chain[n_conv] / conv_floor, 2) if conv_floor else None
        )
        out[fam] = res
        print(json.dumps({fam: res}), flush=True)
        with open(fname, "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
