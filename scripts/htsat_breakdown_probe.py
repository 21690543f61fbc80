"""Whole-model time breakdown for the CLAP (HTSAT-tiny) forward on TPU.

SUPERSEDED — kept as a measurement-trap record. This probe feeds the
precomputed mel to the tower as a jit ARGUMENT, and on the tunneled chip
that measured physically impossible inversions (tower-only slower than the
full mel+tower jit: bf16 12.7 vs 4.87 ms; f32 ablations flat at ~7.7 ms
while the CPU cost analysis proves 95% of the flops were removed). Use
scripts/htsat_breakdown2_probe.py, which ablates inside the full bench
graph. Lesson (CLAUDE.md class): on axon, only time call shapes that match
the production call — argument-fed small jits are not that.

The family sweep has clap-laion at 14% (f32) / 23% (bf16) of the measured
roofline with the round-2 ablation note "attention+layout is free; the gap
is narrow-channel GEMMs". This probe refreshes and extends that decomposition
at the bench geometry (B=16 x 10 s 48 kHz windows):

- full:       mel frontend (f32) + Swin tower + projection (bench fwd)
- tower:      Swin tower only, mel precomputed (isolates the f32 frontend)
- no_mlp:     tower with every MLP (intermediate+output GEMMs) = identity
- no_attn:    tower with _window_attention = identity (qkv/out GEMMs removed
              too — the window partition/roll layout is kept)
- no_swin:    patch embed + patch merging + final pool only (all 12 blocks
              = identity): bounds everything outside the blocks

Arithmetic-intensity context: at C=96..384 the block GEMMs carry ~C FLOP/byte
(bf16), under the ~250 FLOP/byte the MXU/HBM balance needs, so stages 1-3
are expected HBM-bound — the decomposition tells how much a VMEM-resident
fused-block kernel could recover.

Protocol: chained data dependency + one host value fetch, RTT subtracted
(probe_timing, CLAUDE.md). Ablations guide design; any default change needs
the whole-model bench A/B.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/htsat_breakdown_probe.py
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

    import fadtk_tpu.models.htsat as ht
    from fadtk_tpu.dsp.mel import torchlibrosa_log_mel
    from fadtk_tpu.models.clap_laion import _MEL
    from fadtk_tpu.models.htsat import (
        HTSAT_TINY,
        clap_audio_projection,
        htsat_forward,
        init_htsat_params,
    )

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    b = 16
    chunks = jnp.asarray(rng.standard_normal((b, 480000)), jnp.float32) * 0.1

    orig_attn = ht._window_attention
    orig_swin = ht._swin_block

    def no_mlp_swin(cfg, p, x, dims, num_heads, shift):
        # attention half of the block only (layout + qkv/out GEMMs kept)
        saved = p["intermediate"]["kernel"], p["mlp_output"]["kernel"]
        h, w = dims
        window = cfg.window_size
        if min(h, w) <= window:
            shift, window = 0, min(h, w)
        bb, _, c = x.shape
        shortcut = x
        y = ht._ln(x, p["layernorm_before"], cfg.layer_norm_eps).reshape(bb, h, w, c)
        pad_r = (window - w % window) % window
        pad_b = (window - h % window) % window
        if pad_r or pad_b:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = ht._window_partition(y, window)
        mask = ht._shift_attn_mask(hp, wp, window, shift)
        attn = ht._window_attention(cfg, p["attention"], windows, num_heads, window, mask)
        y = ht._window_reverse(attn.reshape(-1, window, window, c), window, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_r or pad_b:
            y = y[:, :h, :w]
        del saved
        return shortcut + y.reshape(bb, h * w, c)

    def identity_attn(cfg, p, x, num_heads, window, attn_mask):
        return x

    def identity_swin(cfg, p, x, dims, num_heads, shift):
        return x

    out = {"rtt_ms": round(rtt * 1e3, 2), "geometry": f"B={b} 10s 48k HTSAT-tiny"}

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
            init_htsat_params(HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=512),
        )
        mel_pre = torchlibrosa_log_mel(chunks, **_MEL).astype(dt)

        def full_fwd(acc, p, ch):
            mel = torchlibrosa_log_mel(ch + acc * 1e-12, **_MEL).astype(dt)
            pooled = htsat_forward(HTSAT_TINY, p, mel[:, None, :, :])
            proj = clap_audio_projection(p["audio_projection"], pooled)
            return acc + proj.astype(jnp.float32).sum()

        def tower_fwd(acc, p, mel):
            pooled = htsat_forward(HTSAT_TINY, p, (mel + acc.astype(dt) * 1e-12)[:, None, :, :])
            proj = clap_audio_projection(p["audio_projection"], pooled)
            return acc + proj.astype(jnp.float32).sum()

        res = {}
        ht._swin_block = orig_swin
        ht._window_attention = orig_attn
        res["full"] = round(window_ms(jax.jit(full_fwd), (params, chunks), rtt), 2)
        res["tower"] = round(window_ms(jax.jit(tower_fwd), (params, mel_pre), rtt), 2)

        ht._swin_block = no_mlp_swin
        res["no_mlp"] = round(window_ms(jax.jit(tower_fwd), (params, mel_pre), rtt), 2)

        ht._swin_block = orig_swin
        ht._window_attention = identity_attn
        res["no_attn"] = round(window_ms(jax.jit(tower_fwd), (params, mel_pre), rtt), 2)

        ht._window_attention = orig_attn
        ht._swin_block = identity_swin
        res["no_swin"] = round(window_ms(jax.jit(tower_fwd), (params, mel_pre), rtt), 2)
        ht._swin_block = orig_swin

        res["mel_delta"] = round(res["full"] - res["tower"], 2)
        res["mlp_delta"] = round(res["tower"] - res["no_mlp"], 2)
        res["attn_delta"] = round(res["tower"] - res["no_attn"], 2)
        res["blocks_delta"] = round(res["tower"] - res["no_swin"], 2)
        out[dtype_name] = res
        print(json.dumps({dtype_name: res}), flush=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "htsat_breakdown.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
