"""Headline benchmark: embedding throughput (audio-sec/sec/chip) of the
wav2vec2-base encoder on the available accelerator, vs the reference's CPU
pipeline (torch, one clip at a time — fadtk processes files serially per
process, fadtk/fad_batch.py:15-22).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

The CPU baseline (HF torch Wav2Vec2Model, base-960h geometry, float32, single
clip per forward with output_hidden_states=True exactly like the reference's
embed loop) is measured once and cached in .bench_cache/.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

SR = 16000
CLIP_SECONDS = 10
BATCH = 16
CACHE = Path(__file__).parent / ".bench_cache" / "cpu_w2v2_base.json"


def bench_tpu(dtype_name: str = "float32", batch: int = 128) -> float:
    """Throughput of the end-to-end scoring pipeline on device: batched
    wav2vec2-base embedding -> float16 storage round-trip -> streaming Welford
    covariance accumulation. Only the (D,) + (D, D) statistics leave the chip —
    the TPU-native dataset-scoring dataflow (embeddings never bounce through
    the host, unlike the reference's per-file .npy round-trip).

    float32 is reference-parity numerics; bf16 is the fast mode (norm stats,
    attention softmax and MXU accumulation stay f32 either way).
    """
    from functools import partial

    import jax

    # Persistent compilation cache: repeated bench runs (and the driver's) skip
    # the multi-minute XLA compile of the scanned step.
    cache_dir = Path(__file__).parent / ".bench_cache" / "xla"
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from fadtk_tpu.metric.stats import welford_finalize, welford_init, welford_update
    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import (
        init_speech_encoder_params,
        speech_encoder_forward,
    )

    cfg = SpeechEncoderConfig(do_normalize=False)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    # Scan K sub-batches inside one executable: amortizes per-dispatch latency
    # (measured ~25 ms/call through the remote-TPU tunnel) the way a streaming
    # input pipeline would. The scanned executable measures ~3500 audio-s/s vs
    # ~2300 for K=1, but costs several minutes of (remote) XLA compile — K
    # defaults to 1 so the benchmark finishes predictably; set
    # FADTK_BENCH_SCAN=4 to measure the pipelined number.
    K = int(os.environ.get("FADTK_BENCH_SCAN", "1"))

    @jax.jit
    def multi_step(p, audio_k, nv_k, state):
        def body(st, inp):
            a, n = inp
            states, mask = speech_encoder_forward(cfg, p, a, n, taps=(cfg.num_layers,))
            frames = states[0].reshape(-1, cfg.hidden_size)
            frames = frames.astype(jnp.float16).astype(jnp.float32)  # cache parity
            return welford_update(st, frames, mask.reshape(-1).astype(jnp.float32)), None

        st, _ = jax.lax.scan(body, state, (audio_k, nv_k))
        return st

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((K, batch, CLIP_SECONDS * SR)), jnp.float32
    ) * 0.1
    num_valid = jnp.full((K, batch), CLIP_SECONDS * SR, jnp.int32)

    # Warmup/compile.
    state = welford_init(cfg.hidden_size)
    state = jax.block_until_ready(multi_step(params, audio, num_valid, state))

    # Best of several measurement windows: the shared/tunneled dev chip shows
    # large transient slowdowns; peak throughput is the hardware-meaningful
    # number. Each iteration feeds the previous state back in (a true data
    # chain) and every window ends with a HOST VALUE FETCH — on this tunneled
    # client block_until_ready can return before remote completion, so only a
    # fetched value proves the work ran.
    iters, windows = max(2, 8 // K), 4
    best = float("inf")
    for _ in range(windows):
        start = time.perf_counter()
        for _ in range(iters):
            state = multi_step(params, audio, num_valid, state)
        float(jnp.sum(state.n) if hasattr(state, "n") else jax.tree.leaves(state)[-1].sum())
        best = min(best, time.perf_counter() - start)
    mu, cov = jax.block_until_ready(welford_finalize(state))
    assert np.isfinite(np.asarray(mu)).all()

    audio_sec = K * batch * CLIP_SECONDS * iters
    return audio_sec / best


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# Published per-chip peak (dense matmul). f32 matmuls on TPU execute as bf16
# MXU passes under JAX's default precision, so one peak serves both modes.
_CHIP_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def _family_cases():
    """(name, build) for each benched family. build(dtype) returns
    (forward, params, inputs, window_seconds, note)."""
    import jax
    import jax.numpy as jnp

    def cast(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
        )

    rng = np.random.default_rng(0)

    def speech(dtype):
        from functools import partial

        from fadtk_tpu.models.speech.config import SpeechEncoderConfig
        from fadtk_tpu.models.speech.encoder import (
            init_speech_encoder_params,
            speech_encoder_forward,
        )

        cfg = SpeechEncoderConfig(do_normalize=False)
        params = cast(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)), dtype)
        b, sec = 128, 10  # batch sweep on v5e: 16->3452, 64->3629, 128->4209 a-s/s, 256 OOMs

        def fwd(p, audio, nv):
            states, mask = speech_encoder_forward(
                cfg, p, audio.astype(dtype), nv, taps=(cfg.num_layers,)
            )
            return states[0].astype(jnp.float32).sum()

        audio = jnp.asarray(rng.standard_normal((b, sec * SR)), jnp.float32) * 0.1
        nv = jnp.full((b,), sec * SR, jnp.int32)
        return fwd, params, (audio, nv), b * sec, (
            "bf16 routes attention through the packed-heads flash kernel "
            "(ops/flash_attention.py flash_attention_packed): it consumes the "
            "(B,T,H*D) projection layout directly - no head transposes, "
            "H*D*itemsize-contiguous DMA rows. Whole-model A/B (round 4): "
            "bf16 221 -> 173 ms/call (+28%) over the per-(b,h) kernel, which "
            "itself beat XLA's materialized (B,H,T,T) logits path"
        )

    def wavlm(dtype):
        from fadtk_tpu.models.speech.config import SpeechEncoderConfig
        from fadtk_tpu.models.speech.encoder import (
            init_speech_encoder_params,
            speech_encoder_forward,
        )

        cfg = SpeechEncoderConfig(attention_type="wavlm", do_normalize=False)
        params = cast(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)), dtype)
        b, sec = 64, 10

        def fwd(p, audio, nv):
            states, mask = speech_encoder_forward(
                cfg, p, audio.astype(dtype), nv, taps=(cfg.num_layers,)
            )
            return states[0].astype(jnp.float32).sum()

        audio = jnp.asarray(rng.standard_normal((b, sec * SR)), jnp.float32) * 0.1
        nv = jnp.full((b,), sec * SR, jnp.int32)
        return fwd, params, (audio, nv), b * sec, (
            "gated relative position bias; bf16 streams it factorized "
            "(gate x (H,BQ,BK) bias slabs) through the PACKED flash kernel "
            "(round 4: +2.2% over the per-(b,h) kernel). The bias tax "
            "(19 of 109 ms, scripts/wavlm_bias_cost_probe.py) is mostly "
            "the per-head gate*pb VPU passes + the gate projection - "
            "semantic, not DMA (bf16 pb streaming recovered only 1.4 ms)"
        )

    def vggish(dtype):
        from fadtk_tpu.models.vggish import init_vggish_params, vggish_forward

        params = cast(init_vggish_params(jax.random.PRNGKey(0)), dtype)
        n = 256  # 0.96 s log-mel examples (big batch: the convs are tiny)

        def fwd(p, ex):
            return vggish_forward(p, ex.astype(dtype)).astype(jnp.float32).sum()

        ex = jnp.asarray(rng.standard_normal((n, 96, 64)), jnp.float32)
        return fwd, params, (ex,), n * 0.96, (
            "0.96 s example-sec; 54% MFU at example-batch 256 (was 7% at 64 - "
            "the 3x3 convs over 96x64 images need a deep batch to fill the MXU)"
        )

    def encodec(dtype):
        from functools import partial

        from fadtk_tpu.models.encodec_impl import (
            CONFIG_24K,
            encodec_encode,
            init_encodec_params,
        )

        params = cast(init_encodec_params(CONFIG_24K, jax.random.PRNGKey(0)), dtype)
        b, sec = 64, 10  # throughput saturates ~64 (8.4k vs 6k window-s/s at 16)

        def fwd(p, x):
            return encodec_encode(CONFIG_24K, p, x.astype(dtype)).astype(
                jnp.float32
            ).sum()

        x = jnp.asarray(rng.standard_normal((b, 1, sec * 24000)), jnp.float32) * 0.1
        return fwd, params, (x,), b * sec, (
            "24k whole-file path at a fixed 10 s shape. Measured bound "
            "(round 4, PERF.md 3.4): f32 runs 1.64x its ideal-fusion HBM "
            "byte floor at the measured 618 GB/s stream bandwidth "
            "(HBM-closed); bf16 2.63x - lane fill (25-50% of the MXU's 128 "
            "lanes at the dominant 32-64ch stages) + elu ~7 ms + lstm "
            "~3.7 ms, NOT traffic. scripts/encodec_{byte_floor,ablation}"
            "_probe.py"
        )

    def clap(dtype):
        from fadtk_tpu.models.htsat import HTSAT_TINY, init_htsat_params

        from fadtk_tpu.dsp.mel import torchlibrosa_log_mel
        from fadtk_tpu.models.clap_laion import _MEL
        from fadtk_tpu.models.htsat import clap_audio_projection, htsat_forward

        params = cast(
            init_htsat_params(HTSAT_TINY, jax.random.PRNGKey(0), projection_dim=512),
            dtype,
        )
        b = 16  # 10 s windows

        def fwd(p, chunks):
            # Mel frontend stays f32; the Swin tower runs in the bench dtype.
            mel = torchlibrosa_log_mel(chunks, **_MEL).astype(dtype)
            pooled = htsat_forward(HTSAT_TINY, p, mel[:, None, :, :])
            proj = clap_audio_projection(p["audio_projection"], pooled)
            return proj.astype(jnp.float32).sum()

        chunks = jnp.asarray(rng.standard_normal((b, 480000)), jnp.float32) * 0.1
        return fwd, params, (chunks,), b * 10, (
            "window-sec; the pipeline's 1 s hop re-reads each second ~10x "
            "(reference chunking semantics), so effective audio-sec = /10. "
            "Was 7% MFU before the framed-GEMM mel frontend. The round-2 "
            "'attention is free' ablation was an artifact of feeding the "
            "mel as a jit argument; the in-graph ablation (round 4, "
            "scripts/htsat_breakdown2_probe.py) puts the window-attention "
            "core at 2.73 of 4.90 ms bf16 - (64, 24)x(24, 64) matmuls at "
            "~4.7% MXU tile fill. FADTK_TPU_SWIN_MERGE=2 (default) merges "
            "2 windows per call behind a block-diagonal mask: bf16 "
            "4.90 -> 3.75 ms, f32 7.93 -> 7.12 (bit-exact vs unmerged in "
            "f32). Batch sweep: B=16 is the throughput max (b128 runs at "
            "0.65x the per-window rate)"
        )

    def whisper(dtype):
        from fadtk_tpu.models.whisper_impl import config_for_size, whisper_forward

        cfg = config_for_size("base")
        from fadtk_tpu.models.whisper_impl import init_whisper_params

        params = cast(init_whisper_params(cfg, jax.random.PRNGKey(0)), dtype)
        b = 16

        def fwd(p, feats):
            return whisper_forward(cfg, p, feats.astype(dtype)).astype(
                jnp.float32
            ).sum()

        feats = jnp.asarray(rng.standard_normal((b, 80, 3000)), jnp.float32) * 0.5
        return fwd, params, (feats,), b * 30, (
            "every clip costs one fixed 30 s window. Breakdown (round 4, "
            "scripts/whisper_breakdown_probe.py, bf16 B=16 = 20.7 ms): "
            "encoder self-attention 12.2, MLPs 4.1, convs 2.0, 2-token "
            "decoder 3.3 - the bind is T=1500 attention at hd=64 (50% "
            "K-tile fill + bf16 softmax VPU passes, ~19% attention-flop "
            "efficiency). Flash loses here in both dtypes (logits already "
            "compute-dtype; packed-kernel re-probe 0.87-0.91x) and B=16 is "
            "the batch-sweep max (32/64 run at 0.92/0.89x per window)"
        )

    def dac(dtype):
        from fadtk_tpu.models.dac_impl import DAC_44K, dac_encode, init_dac_params

        params = cast(init_dac_params(DAC_44K, jax.random.PRNGKey(0)), dtype)
        b = 8  # 5 s windows

        def fwd(p, x):
            return dac_encode(DAC_44K, p, x.astype(dtype)).astype(jnp.float32).sum()

        x = jnp.asarray(rng.standard_normal((b, 1, 220500)), jnp.float32) * 0.1
        return fwd, params, (x,), b * 5, (
            "window-sec; 50% hop doubles work vs audio-sec. The round-2/3 "
            "'near the conv roofline' diagnosis was wrong: the snake "
            "activation's XLA sin was 55.7 of 86.0 ms (65% - "
            "scripts/conv_family_ablation_probe.py). The Cody-Waite "
            "polynomial sin (ops/fastmath.py, default; "
            "FADTK_TPU_EXACT_SIN=1 restores the builtin) runs the model at "
            "~33 ms = 2.6x, 40% of roofline; the conv stack alone floors "
            "at ~31 ms (31-ms 'none' ablation), so the remaining gap IS "
            "now the narrow-channel conv bound"
        )

    def cdpam(dtype):
        from fadtk_tpu.models.cdpam_impl import (
            DEFAULT_CONFIG,
            cdpam_forward,
            init_cdpam_params,
        )

        params = cast(init_cdpam_params(jax.random.PRNGKey(0), DEFAULT_CONFIG), dtype)
        b = 256  # 1 s chunks (tiny channels: needs a deep batch to fill the MXU)

        def fwd(p, chunks, lengths):
            return cdpam_forward(DEFAULT_CONFIG, p, chunks.astype(dtype), lengths)[
                1
            ].astype(jnp.float32).sum()

        chunks = jnp.asarray(rng.standard_normal((b, 22050)), jnp.float32) * 8000
        lengths = jnp.full((b,), 22050, jnp.int32)
        return fwd, params, (chunks, lengths), b * 1.0, (
            "MFU diagnosis: k=3 stride-2 convs halve the sequence every "
            "layer, so most samples are touched by the narrow (64ch) early "
            "layers - intensity ~ k*C bytes/flop; bf16 doubles throughput "
            "(bandwidth-bound); the whole model is 21 GFLOP per 256 s of audio"
        )

    def speech_large(dtype):
        """w2v2/hubert/wavlm-large geometry: 24 x 1024, layer-norm features."""
        from fadtk_tpu.models.speech.config import large_config
        from fadtk_tpu.models.speech.encoder import (
            init_speech_encoder_params,
            speech_encoder_forward,
        )

        cfg = large_config(do_normalize=False)
        params = cast(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)), dtype)
        b, sec = 64, 10  # half the base batch: 2x layers x (4/3)^2 width

        def fwd(p, audio, nv):
            states, mask = speech_encoder_forward(
                cfg, p, audio.astype(dtype), nv, taps=(cfg.num_layers,)
            )
            return states[0].astype(jnp.float32).sum()

        audio = jnp.asarray(rng.standard_normal((b, sec * SR)), jnp.float32) * 0.1
        nv = jnp.full((b,), sec * SR, jnp.int32)
        return fwd, params, (audio, nv), b * sec, (
            "1024x24 GEMM stack (wider tiles than base: MXU-friendlier)"
        )

    def mert(dtype):
        """MERT-v1-95M: base geometry at 24 kHz (1.5x conv-frontend work and
        1.5x frames per audio-second vs the 16 kHz speech family)."""
        from fadtk_tpu.models.speech.config import base_config
        from fadtk_tpu.models.speech.encoder import (
            init_speech_encoder_params,
            speech_encoder_forward,
        )

        cfg = base_config(do_normalize=True)
        params = cast(init_speech_encoder_params(cfg, jax.random.PRNGKey(0)), dtype)
        b, sec, sr = 96, 10, 24000

        def fwd(p, audio, nv):
            states, mask = speech_encoder_forward(
                cfg, p, audio.astype(dtype), nv, taps=(cfg.num_layers,)
            )
            return states[0].astype(jnp.float32).sum()

        audio = jnp.asarray(rng.standard_normal((b, sec * sr)), jnp.float32) * 0.1
        nv = jnp.full((b,), sec * sr, jnp.int32)
        return fwd, params, (audio, nv), b * sec, (
            "24 kHz audio-sec: T=749 frames per 10 s (1.5x the 16 kHz "
            "families); bf16 flash runs a single adaptive 768 block instead "
            "of padding to 1024 (round-4 A/B: 327 -> 264 ms/call)"
        )

    def whisper_large(dtype):
        from fadtk_tpu.models.whisper_impl import config_for_size, whisper_forward

        # Scan-over-layers halves HLO size and cuts compile ~3x for the 32+32
        # layer stacks (round-2 measurement); accumulation-order change is
        # irrelevant for a throughput bench.
        os.environ["FADTK_TPU_SCAN_LAYERS"] = "1"
        cfg = config_for_size("large")
        from fadtk_tpu.models.whisper_impl import init_whisper_params

        params = cast(init_whisper_params(cfg, jax.random.PRNGKey(0)), dtype)
        b = 8

        def fwd(p, feats):
            return whisper_forward(cfg, p, feats.astype(dtype)).astype(
                jnp.float32
            ).sum()

        feats = jnp.asarray(
            rng.standard_normal((b, cfg.num_mel_bins, 3000)), jnp.float32
        ) * 0.5
        # XLA cost_analysis does NOT multiply While-loop (scan) bodies by
        # trip count — it reported 786 GFLOP/call for a model whose GEMM
        # closed form is ~20.7 TF/call (round 3), deflating MFU 26x. Supply
        # the analytic count: convs + encoder/decoder stacks + cross k/v
        # over the 1500 encoder states (decoder runs 2 forced tokens).
        d, h, te, td = cfg.d_model, cfg.encoder_heads, 1500, 2
        enc_layer = (4 * te * d * d + 2 * te * te * d + 2 * te * d * cfg.encoder_ffn) * 2
        dec_layer = (
            (4 * td * d * d)            # self qkvo
            + (2 * td * d * d)          # cross q/out
            + (2 * te * d * d)          # cross k/v over encoder states
            + (2 * td * d * cfg.decoder_ffn)
        ) * 2
        convs = (3000 * d * cfg.num_mel_bins * 3 + te * d * d * 3) * 2
        flops = b * (
            convs
            + cfg.encoder_layers * enc_layer
            + cfg.decoder_layers * dec_layer
        )
        return fwd, params, (feats,), b * 30, (
            "BASELINE.json config 5; 1280x(32+32) stack, scan-over-layers "
            "compile mode; every clip costs one fixed 30 s window; flops "
            "are the analytic GEMM count (cost_analysis undercounts scan "
            "bodies by the trip count)"
        ), float(flops)

    def encodec_48k(dtype):
        from fadtk_tpu.models.encodec_impl import (
            CONFIG_48K,
            encodec_encode,
            init_encodec_params,
        )

        params = cast(init_encodec_params(CONFIG_48K, jax.random.PRNGKey(0)), dtype)
        b = 64  # 1 s stereo segments (the reference's segment_length stride)

        def fwd(p, x):
            return encodec_encode(CONFIG_48K, p, x.astype(dtype)).astype(
                jnp.float32
            ).sum()

        x = jnp.asarray(rng.standard_normal((b, 2, 48000)), jnp.float32) * 0.1
        return fwd, params, (x,), b * 1.0, (
            "segment-sec; stereo 48k 1 s segments. The per-conv "
            "time_group_norm is 44% of the bf16 forward (9.7 of 21.9 ms - "
            "scripts/conv_family_ablation_probe.py): bf16 computes the "
            "moments one-pass with f32 accumulation (21.7 -> 17.2 ms); f32 "
            "keeps two-pass mean/var (one-pass cancels at 1.4e-2 on the "
            "parity path). Residual bound (round 4, PERF.md 3.4): f32 1.68x "
            "/ bf16 1.91x of the ideal-fusion byte floor at measured "
            "bandwidth - fill + norm passes, not halo traffic"
        )

    def clap_ms(dtype):
        from fadtk_tpu.models.clap_ms import _SR, _MelParams, msclap_projection
        from fadtk_tpu.dsp.mel import torchlibrosa_log_mel
        from fadtk_tpu.models.htsat import HTSATConfig, htsat_forward, init_htsat_params

        cfg = HTSATConfig(embed_dim=96)
        mel = _MelParams()
        params = init_htsat_params(cfg, jax.random.PRNGKey(0), projection_dim=None)
        params["projection"] = {
            "linear1": {"kernel": jnp.zeros((768, 1024))},
            "linear2": {"kernel": jnp.zeros((1024, 1024))},
            "layer_norm": {"scale": jnp.ones((1024,)), "bias": jnp.zeros((1024,))},
        }
        params = cast(params, dtype)
        b = 16  # 7 s windows

        def fwd(p, chunks):
            m = torchlibrosa_log_mel(
                chunks, sr=_SR, n_fft=mel.n_fft, hop=mel.hop, n_mels=mel.n_mels,
                fmin=mel.fmin, fmax=mel.fmax,
            ).astype(dtype)
            pooled = htsat_forward(cfg, p, m[:, None, :, :])
            return msclap_projection(p["projection"], pooled).astype(jnp.float32).sum()

        chunks = jnp.asarray(rng.standard_normal((b, 7 * _SR)), jnp.float32) * 0.1
        return fwd, params, (chunks,), b * 7.0, (
            "window-sec; msclap 7 s / 1 s hop re-reads each second ~7x. Same "
            "HTSAT-tiny tower as clap-laion with the msclap projection head"
        )

    return {
        "w2v2-base": speech,
        "w2v2-large": speech_large,
        "wavlm-base": wavlm,
        "MERT-v1-95M": mert,
        "vggish": vggish,
        "encodec-emb": encodec,
        "encodec-emb-48k": encodec_48k,
        "clap-laion-audio": clap,
        "clap-2023": clap_ms,
        "whisper-base": whisper,
        "whisper-large": whisper_large,
        "dac-44kHz": dac,
        "cdpam-acoustic": cdpam,
    }


def measure_matmul_roofline(dtypes=("float32", "bfloat16"), m=None, n=20) -> dict:
    """Measured achievable GEMM rate (TF/s) per dtype on THIS device.

    Nominal peaks overstate what a tunneled/shared bench chip can actually
    deliver: on the round-2 bench host every dtype (f32, bf16, even int8)
    capped at ~66 TF/s — exactly the 3-pass-f32 rate — so ``mfu_pct`` against
    the 197 TF/s nominal bf16 peak underestimates how close a family runs to
    the machine's real ceiling. Each family entry therefore also reports
    ``pct_of_measured_roofline`` against the dtype-matched number measured
    here (same honest fetch-synced timing as the family loop).

    The rate is the BEST over a few matrix sizes per dtype, timed with the
    SAME protocol as the family loop (multi-call chain with a data
    dependency, ONE value fetch, measured RTT subtracted). Round 3 found the
    original single-call-per-fetch probe at one 4096³ shape buried ~18 ms of
    compute under ~28 ms of tunnel round-trip, reporting 66-70 TF/s where
    the chip actually sustains ~190 TF/s (whisper-large bf16 'exceeding the
    roofline' at 141% was the tell). An understated denominator overstates
    every family's pct_of_measured_roofline."""
    import jax
    import jax.numpy as jnp

    sizes = (m,) if m else (4096, 8192)
    rng = np.random.default_rng(0)
    out = {}
    for dtype_name in dtypes:
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        best_tf = 0.0
        for mm in sizes:
            a = jnp.asarray(rng.standard_normal((mm, mm)), dtype)
            b = jnp.asarray(rng.standard_normal((mm, mm)), dtype)

            @jax.jit
            def step(a, b, acc, mm=mm):
                x = a * (1.0 + acc * 1e-30)  # chain: serialize on prior call
                for _ in range(n):
                    x = (x @ b) * (1.0 / mm)
                return x.astype(jnp.float32).sum()

            zero = jnp.float32(0.0)
            float(step(a, b, zero))  # compile + warm (fetch-synced)
            trivial = jax.jit(lambda s: s + 1.0)
            float(trivial(zero))
            rtt = min(_timed(lambda: float(trivial(zero))) for _ in range(5))
            est = max(_timed(lambda: float(step(a, b, zero))) - rtt, 1e-4)
            iters = int(min(max(4, 0.5 / est), 64))
            best = float("inf")
            for _ in range(3):
                acc = zero
                t0 = time.perf_counter()
                for _ in range(iters):
                    acc = step(a, b, acc)
                float(acc)  # one fetch syncs the whole chain
                best = min(best, (time.perf_counter() - t0 - rtt) / iters)
            best_tf = max(best_tf, 2 * mm * mm * mm * n / best / 1e12)
        out[dtype_name] = round(best_tf, 1)
    return out


def bench_families(dtypes=("float32", "bfloat16")) -> dict:
    """Throughput (window-audio-sec/sec/chip) + MFU for every major family.

    MFU = XLA's own cost_analysis flops x calls/sec / chip peak. Written to
    .bench_cache/families.json and folded into the headline JSON line.

    Caveat: cost_analysis overcounts conv flops by up to ~1.6x (vggish: XLA
    reports 405 GF/call where the closed-form conv+FC count is ~255 GF, which
    is why its pct_of_measured_roofline can exceed 100). Conv-family MFU is
    therefore an upper bound; GEMM-stack families (speech/whisper) are exact.
    """
    import jax
    import jax.numpy as jnp

    peak = _CHIP_PEAK_FLOPS.get(jax.devices()[0].device_kind)
    peak = float(os.environ.get("FADTK_BENCH_PEAK_FLOPS", peak or 197e12))

    try:
        measured_tf = measure_matmul_roofline(dtypes)
    except Exception as e:
        measured_tf = {}
        print(f"# matmul roofline probe failed: {e}", flush=True)

    # Remote XLA compiles can take minutes each when the persistent cache is
    # cold; bound the sweep so the driver's round-end bench always finishes.
    budget_s = float(os.environ.get("FADTK_BENCH_BUDGET_S", "1500"))
    sweep_start = time.perf_counter()

    results: dict = {"device_kind": jax.devices()[0].device_kind, "peak_flops": peak}
    if measured_tf:
        results["measured_matmul_tf"] = measured_tf
    only = os.environ.get("FADTK_BENCH_FAMILIES_ONLY", "").split()
    for name, build in _family_cases().items():
        if only and name not in only:
            continue
        results[name] = {}
        for dtype_name in dtypes:
            if time.perf_counter() - sweep_start > budget_s:
                results[name][dtype_name] = {"skipped": "sweep time budget"}
                continue
            dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
            try:
                built = build(dtype)
                fwd, params, inputs, window_sec, note = built[:5]
                flops_override = built[5] if len(built) > 5 else None

                # Honest tunneled-device timing: block_until_ready can return
                # before remote completion on this client (measured: a 200x
                # 2048^3 matmul chain "completes" in 0.02 ms without a fetch),
                # so every iteration chains a data dependency through the
                # previous scalar result and the window ends with a HOST VALUE
                # FETCH; the measured round-trip latency is subtracted.
                def step(p, acc, *ins):
                    perturbed = (ins[0] * (1.0 + acc * 1e-30),) + tuple(ins[1:])
                    return acc + fwd(p, *perturbed)

                jstep = jax.jit(step)
                zero = jnp.float32(0.0)
                compiled = jstep.lower(params, zero, *inputs).compile()
                flops = float(compiled.cost_analysis().get("flops", 0.0))
                if flops_override is not None:
                    flops = flops_override
                float(jstep(params, zero, *inputs))  # warm (fetch-synced)

                trivial = jax.jit(lambda a: a + 1.0)
                float(trivial(zero))
                rtt = min(
                    _timed(lambda: float(trivial(zero))) for _ in range(5)
                )

                # Adaptive chain length: for fast families (vggish ~3 ms,
                # cdpam ~2 ms) an 8-call chain is the same magnitude as the
                # ~30 ms tunnel RTT being subtracted — the quotient is noise
                # (round-1 sweeps reported vggish bf16 above the measured
                # matmul roofline, physically impossible). Size the chain so
                # it dwarfs the RTT.
                est = max(_timed(lambda: float(jstep(params, zero, *inputs))) - rtt, 1e-4)
                iters = int(min(max(8, 0.5 / est), 256))
                windows = 3
                best = float("inf")
                for _ in range(windows):
                    acc = zero
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        acc = jstep(params, acc, *inputs)
                    float(acc)  # force true completion of the whole chain
                    best = min(best, time.perf_counter() - t0)
                per_call = max(best - rtt, 1e-9) / iters
                entry = {
                    "audio_sec_per_sec": round(window_sec / per_call, 1),
                    "mfu_pct": round(100.0 * flops / per_call / peak, 2),
                    "gflops_per_call": round(flops / 1e9, 2),
                    "ms_per_call": round(per_call * 1000, 2),
                }
                if measured_tf.get(dtype_name):
                    entry["pct_of_measured_roofline"] = round(
                        100.0 * flops / per_call / (measured_tf[dtype_name] * 1e12), 2
                    )
                if note:
                    entry["note"] = note
                results[name][dtype_name] = entry
                print(f"# {name} {dtype_name}: {entry}", flush=True)
            except Exception as e:  # keep the sweep alive per family
                results[name][dtype_name] = {"error": str(e)[:200]}
                print(f"# {name} {dtype_name} FAILED: {e}", flush=True)

    out = CACHE.parent / "families.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    return results


def _busy_load_threshold() -> float:
    # Relative to core count: on the documented 1-core bench host a
    # concurrent pytest run shows loadavg ~2, which already deflates the
    # baseline 3x; a fixed threshold of 4 would never fire there.
    return max(1.5, 0.75 * (os.cpu_count() or 1))


def bench_cpu_reference() -> float:
    if CACHE.exists():
        cached = json.loads(CACHE.read_text())
        if cached.get("loadavg_at_measure", 0.0) <= _busy_load_threshold():
            return cached["audio_sec_per_sec"]
        print(
            f"# cached CPU baseline was measured under load "
            f"{cached['loadavg_at_measure']:.1f} (deflated); re-measuring",
            flush=True,
        )

    # The baseline must be measured on an idle host: a concurrent test suite
    # or bench sweep steals the torch threads and deflates the CPU number,
    # inflating vs_baseline (observed: 5.3 -> 1.6 audio-s/s under a full
    # pytest run). Record the load so a skewed measurement is evident.
    load1 = os.getloadavg()[0]
    if load1 > _busy_load_threshold():
        print(
            f"# WARNING: load {load1:.1f} while measuring the CPU baseline; "
            "the cached number may be deflated — delete "
            f"{CACHE} and re-run on an idle host",
            flush=True,
        )

    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.set_num_threads(max(1, (torch.get_num_threads() or 8)))
    model = Wav2Vec2Model(
        Wav2Vec2Config(
            hidden_dropout=0.0, attention_dropout=0.0, layerdrop=0.0,
            mask_time_prob=0.0, mask_feature_prob=0.0,
        )
    )
    model.eval()

    rng = np.random.default_rng(0)
    clip = torch.from_numpy(
        (rng.standard_normal((1, CLIP_SECONDS * SR)) * 0.1).astype(np.float32)
    )

    with torch.no_grad():
        model(clip, output_hidden_states=True)  # warmup
        n = 3
        start = time.perf_counter()
        for _ in range(n):
            out = model(clip, output_hidden_states=True)
            _ = torch.stack(out.hidden_states).squeeze().numpy()
        elapsed = time.perf_counter() - start

    value = n * CLIP_SECONDS / elapsed
    CACHE.parent.mkdir(exist_ok=True)
    CACHE.write_text(
        json.dumps({"audio_sec_per_sec": value, "loadavg_at_measure": load1})
    )
    return value


def bench_sqrtm_fad_inf() -> dict:
    """Secondary tracked metrics (BASELINE.md): sqrtm and FAD-inf wall times.

    Written to .bench_cache/extra_metrics.json; the driver-facing stdout stays
    a single JSON line.

    The NS-sqrtm loop uses the §5 chained protocol (data dependency through
    every iteration, ONE value fetch, measured RTT subtracted): the original
    per-iteration float() fetch paid a full tunnel round-trip per call, and a
    congestion window turned the measured 68 ms into 5353 ms (2026-08-19) —
    per-dispatch-fetch loops measure the tunnel's bad days, not the chip.
    The FAD-inf number intentionally keeps end-to-end semantics (it INCLUDES
    shipping the 100k x 768 f16 frame matrix, ~150 MB, which dominates on the
    tunneled link but not on a PCIe host) and reports the RTT next to it so
    the link share is visible.
    """
    import jax
    import jax.numpy as jnp

    from fadtk_tpu.metric.device_scoring import fad_inf_device
    from fadtk_tpu.metric.frechet import FrechetBaseline, trace_sqrtm_product_ns

    rng = np.random.default_rng(0)
    d = 1024
    a = rng.standard_normal((d, 2 * d))
    cov1 = (a @ a.T / (2 * d)).astype(np.float64)
    b = rng.standard_normal((d, 2 * d))
    cov2 = (b @ b.T / (2 * d)).astype(np.float64)
    mu1, mu2 = rng.standard_normal(d), rng.standard_normal(d)

    # Device Newton-Schulz sqrtm trace (f32), chained-window protocol: each
    # iteration's input depends on the previous trace (serializes the chain,
    # defeats result reuse), one fetch syncs the window, RTT subtracted.
    c1 = jnp.asarray(cov1, jnp.float32)
    c2 = jnp.asarray(cov2, jnp.float32)

    @jax.jit
    def ns_step(c1, c2, acc):
        return acc + trace_sqrtm_product_ns(c1 * (1.0 + acc * 1e-30), c2)

    zero = jnp.float32(0.0)
    assert np.isfinite(float(ns_step(c1, c2, zero)))  # compile + warm
    trivial = jax.jit(lambda s: s + 1.0)
    float(trivial(zero))
    rtt = min(_timed(lambda: float(trivial(zero))) for _ in range(5))
    iters = 10
    ns_ms = float("inf")
    for _ in range(3):
        acc = zero
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = ns_step(c1, c2, acc)
        assert np.isfinite(float(acc))  # one fetch syncs the whole chain
        ns_ms = min(ns_ms, max(time.perf_counter() - t0 - rtt, 1e-6) / iters * 1000)

    # Host f64 eigh sqrtm (parity path).
    t0 = time.perf_counter()
    fb = FrechetBaseline(mu1, cov1)
    fb.distance(mu2, cov2)
    eigh_ms = (time.perf_counter() - t0) * 1000

    # Device FAD-inf sweep: 25 subsamples of a 100k x 768 frame matrix.
    frames = rng.standard_normal((100_000, 768)).astype(np.float16)
    a = rng.standard_normal((768, 1536))
    cov_b = (a @ a.T / 1536).astype(np.float64)
    mu_b = rng.standard_normal(768)
    fad_inf_device(mu_b, cov_b, frames, steps=25, min_n=500, seed=0)  # compile
    t0 = time.perf_counter()
    fad_inf_device(mu_b, cov_b, frames, steps=25, min_n=500, seed=0)
    fad_inf_s = time.perf_counter() - t0

    # Per-song device scoring wall time (BASELINE.md tracked-metric contract,
    # round-4 verdict #5) — end-to-end semantics like the FAD-inf row: each
    # batch ships its f16 frames and fetches its scores (one RTT per batch,
    # production behavior). Three shapes cover the Gram-side split in
    # _per_song_batch: speech-typical (L=499 <= D), whisper-style 2-frame
    # songs (rank-deficient), and frame-dense (L=4992 > D, the (D, D) side).
    from fadtk_tpu.metric.device_scoring import PerSongScorer

    per_song = {}
    for tag, d_song, n_songs, frames_per in (
        ("speech_d768_499f_64songs", 768, 64, 499),
        ("whisper_d1280_2f_64songs", 1280, 64, 2),
        ("dense_d768_4992f_16songs", 768, 16, 4992),
    ):
        a = rng.standard_normal((d_song, 2 * d_song))
        cov_base = (a @ a.T / (2 * d_song)).astype(np.float64)
        mu_base = rng.standard_normal(d_song)
        songs = [
            rng.standard_normal((frames_per, d_song)).astype(np.float16)
            for _ in range(n_songs)
        ]
        scorer = PerSongScorer(mu_base, cov_base)
        s_warm = scorer.score_batch(songs[: scorer.batch_size])  # compile bucket
        assert np.isfinite(s_warm).all()
        t0 = time.perf_counter()
        s_all = scorer.score_batch(songs)
        per_song[f"per_song_{tag}_s"] = round(time.perf_counter() - t0, 3)
        assert np.isfinite(s_all).all()

    extra = {
        "sqrtm_ns_device_ms_d1024": round(ns_ms, 2),
        "sqrtm_eigh_host_ms_d1024": round(eigh_ms, 2),
        # End-to-end semantics: includes shipping the ~150 MB f16 frame
        # matrix over the link (dominant on the tunnel, negligible on PCIe).
        "fad_inf_device_25steps_100k_frames_s": round(fad_inf_s, 2),
        **per_song,
        "tunnel_rtt_ms_at_measure": round(rtt * 1e3, 1),
    }
    out = CACHE.parent / "extra_metrics.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(extra, indent=2))
    return extra


def bench_e2e(n_files: int = 128, seconds: int = 10, src_sr: int = 44100) -> dict:
    """End-to-end cache-pipeline throughput: 44.1 kHz WAV files on disk ->
    decode -> Kaiser resample to 16 kHz -> batched w2v2-base embedding ->
    float16 .npy store. This is the user-facing `fadtk` number (the headline
    bench isolates the device forward; this one includes host IO, the convert
    stage, and cache writes). Random weights; a fresh temp dataset each run
    so nothing is pre-cached.
    """
    import shutil
    import tempfile

    # Restore afterwards: leaving the var set would silently flip later
    # in-process model loads into random-weights mode (same latent-bug class
    # fixed in weights/dryrun.py).
    saved_rw = os.environ.get("FADTK_TPU_RANDOM_WEIGHTS")
    os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.batch import cache_embedding_files

    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="fadtk_bench_e2e_"))
    try:
        t = np.arange(seconds * src_sr) / src_sr
        for i in range(n_files):
            x = 0.25 * np.sin(2 * np.pi * float(rng.uniform(100, 2000)) * t)
            x = x + 0.02 * rng.standard_normal(t.shape[0])
            write_wav_int16(str(root / f"clip{i:04d}.wav"), float_to_int16(x), src_sr)

        model = get_model("w2v2-base")
        model.ensure_loaded()
        # Warm the jit caches outside the timed window (compile is a
        # once-per-deployment cost, amortized in production). The warm set
        # must match the pipeline's batch window (workers*4 files of the same
        # bucket) — a smaller warm batch compiles a different shape and the
        # real one would compile inside the timed window.
        warm = root / "warm"
        warm.mkdir()
        for i in range(32):
            shutil.copy(root / "clip0000.wav", warm / f"w{i:02d}.wav")
        cache_embedding_files(warm, model, workers=8)

        t0 = time.perf_counter()
        cache_embedding_files(root, model, workers=8)
        wall = time.perf_counter() - t0

        # Pure decode floor: the irreducible host work per file (the convert
        # stage's resample/quantize runs on device in the pipeline below).
        from fadtk_tpu.audio.decode import decode_audio

        dec_files = sorted(root.glob("clip*.wav"))[:32]
        decode_audio(dec_files[0])  # warm the lib
        t0 = time.perf_counter()
        for f in dec_files:
            x, _sr = decode_audio(f)
            np.mean(x, axis=0)
        decode_wall = time.perf_counter() - t0
        decode_rate = len(dec_files) * seconds / decode_wall

        # Convert floor: decode + downmix + Kaiser resample + int16 quantize
        # on the host — the mandatory per-file work of the HOST transport.
        # The decode-only floor above omits the resample the pipeline cannot
        # skip, so *_vs_decode_floor understates utilization on a 1-core
        # host; *_vs_convert_floor is the honest bound (its residual is
        # device dispatch serialization + link bytes only).
        from fadtk_tpu.dsp.resample import resample_kaiser

        t0 = time.perf_counter()
        for f in dec_files:
            x, f_sr = decode_audio(f)
            float_to_int16(resample_kaiser(np.mean(x, axis=0), int(f_sr), model.sr))
        convert_wall = time.perf_counter() - t0
        convert_rate = len(dec_files) * seconds / convert_wall

        # Device-pipeline scoring on a NEVER-cached copy: decode on host,
        # Kaiser resample + PCM quantization + embedding + Gaussian
        # accumulation all on device (runner/convert.py + device_pipeline).
        from fadtk_tpu.runner.device_pipeline import dataset_stats_device

        fresh = root / "fresh"
        fresh.mkdir()
        for f in sorted(root.glob("clip*.wav")):
            shutil.copy(f, fresh / f.name)
        # A/B both convert transports each round (this A/B is what flipped
        # the default to "host" in round 3: 254 vs 130 audio-s/s here).
        # Device transport: resample on the MXU, ~1.5 MB/clip over the link.
        saved_tr = os.environ.get("FADTK_TPU_CONVERT_TRANSPORT")
        os.environ["FADTK_TPU_CONVERT_TRANSPORT"] = "device"
        try:
            # Warm the convert + eval-step executables on the warm dir's shapes.
            dataset_stats_device(model, warm, batch=16)
            t0 = time.perf_counter()
            dataset_stats_device(model, fresh, batch=16)
            dp_wall = time.perf_counter() - t0

            # Host transport (default): resample on the decode threads
            # (bit-parity with the cached path), only target-rate int16
            # (~0.32 MB/clip) crosses the link. Embedding executables are
            # shape-identical, so no extra warmup.
            fresh2 = root / "fresh2"
            fresh2.mkdir()
            for f in sorted(root.glob("clip*.wav")):
                shutil.copy(f, fresh2 / f.name)
            os.environ["FADTK_TPU_CONVERT_TRANSPORT"] = "host"
            t0 = time.perf_counter()
            dataset_stats_device(model, fresh2, batch=16)
            hp_wall = time.perf_counter() - t0
        finally:
            if saved_tr is None:
                os.environ.pop("FADTK_TPU_CONVERT_TRANSPORT", None)
            else:
                os.environ["FADTK_TPU_CONVERT_TRANSPORT"] = saved_tr

        out = {
            "e2e_files": n_files,
            "e2e_wall_s": round(wall, 2),
            "e2e_files_per_sec": round(n_files / wall, 2),
            "e2e_audio_sec_per_sec": round(n_files * seconds / wall, 1),
            "decode_only_audio_sec_per_sec": round(decode_rate, 1),
            "convert_floor_audio_sec_per_sec": round(convert_rate, 1),
            "device_pipeline_wall_s": round(dp_wall, 2),
            "device_pipeline_audio_sec_per_sec": round(n_files * seconds / dp_wall, 1),
            "device_pipeline_vs_decode_floor": round(
                (n_files * seconds / dp_wall) / decode_rate, 3
            ),
            "host_transport_wall_s": round(hp_wall, 2),
            "host_transport_audio_sec_per_sec": round(
                n_files * seconds / hp_wall, 1
            ),
            "host_transport_vs_decode_floor": round(
                (n_files * seconds / hp_wall) / decode_rate, 3
            ),
            "host_transport_vs_convert_floor": round(
                (n_files * seconds / hp_wall) / convert_rate, 3
            ),
            "host_cpu_cores": os.cpu_count(),
            "note": (
                "e2e_* = the caching path (host hybrid BLAS/FFT Kaiser "
                "resample, ~8-10 ms per 10 s clip after the round-3 fix, + "
                "wav/npy writes - the price of bit-parity caches). "
                "device_pipeline_* = the scoring-only pipeline with the "
                "DEVICE convert transport (FADTK_TPU_CONVERT_TRANSPORT="
                "device): resample/quantize on the MXU, ~1.5 MB/clip over "
                "the link. host_transport_* = the same pipeline with the "
                "default host transport: resample on the decode threads "
                "(bit-parity with the cached path), ~0.32 MB/clip over the "
                "link. convert_floor_* = decode+resample+quantize only — the "
                "mandatory host work of the host transport; the residual of "
                "host_transport vs THAT floor is device dispatch "
                "serialization + link bytes, which a PCIe-attached TPU host "
                "would not pay. The device forward alone benches at 4200+ "
                "audio-s/s"
            ),
        }
        cache_out = CACHE.parent / "e2e.json"
        cache_out.parent.mkdir(exist_ok=True)
        cache_out.write_text(json.dumps(out, indent=2))
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if saved_rw is None:
            os.environ.pop("FADTK_TPU_RANDOM_WEIGHTS", None)
        else:
            os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = saved_rw


def run_selfcheck_gate(timeout_s: float | None = None) -> dict:
    """Run the selfcheck golden gate (CLAUDE.md) on the DEFAULT backend — the
    real TPU in the driver's round-end bench — and record its exit code.

    The pytest suite pins the same numbers on the virtual CPU mesh; this is
    the device-path twin (r2 verdict #8): deterministic random weights over
    the reference opus clips, mad% < 5 against selfcheck/golden.csv, exit 2
    on numeric regression. Runs as a subprocess with fresh caches; the full
    report lands in .bench_cache/selfcheck.json.
    """
    import shutil
    import subprocess
    import sys
    import tempfile

    timeout_s = timeout_s or float(os.environ.get("FADTK_BENCH_SELFCHECK_S", "1500"))
    repo = Path(__file__).parent
    ref = Path(os.environ.get("FADTK_REF_TEST", "/root/reference/fadtk/test"))
    clips = sorted((ref / "samples").glob("*.opus"))
    sc = repo / "selfcheck"
    if not clips or not (sc / "golden.csv").exists():
        return {"selfcheck_exit": None, "selfcheck_note": "fixtures missing"}

    # Default to a 4-family cross-section (GEMM stack, conv stack, Swin,
    # seq2seq) so the round-end bench stays inside its budget even on a
    # slow-compile day; FADTK_BENCH_SELFCHECK_MODELS=all runs every golden
    # family (the full gate is also what scripts/../--selfcheck records).
    models_env = os.environ.get(
        "FADTK_BENCH_SELFCHECK_MODELS",
        "vggish w2v2-base encodec-emb-48k whisper-tiny",
    )
    model_args = [] if models_env.strip() == "all" else (
        ["--models"] + models_env.split()
    )

    with tempfile.TemporaryDirectory(prefix="fadtk_selfcheck_") as td:
        samples = Path(td) / "samples"
        samples.mkdir()
        for f in clips:
            shutil.copy(f, samples / f.name)
        env = dict(os.environ, FADTK_TPU_RANDOM_WEIGHTS="1")
        env["PYTHONPATH"] = os.pathsep.join(
            [str(repo)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        )
        t0 = time.perf_counter()
        try:
            p = subprocess.run(
                [sys.executable, "-m", "fadtk_tpu.test",
                 "--samples", str(samples),
                 "--golden", str(sc / "golden.csv"),
                 "--baseline", str(sc / "baseline.npz"),
                 "--out-dir", str(Path(td) / "scores")] + model_args,
                cwd=td, env=env, capture_output=True, text=True, timeout=timeout_s,
            )
            code, tail = p.returncode, (p.stdout + p.stderr)[-4000:]
        except subprocess.TimeoutExpired:
            code, tail = -9, f"timed out after {timeout_s}s"
        out = {
            "selfcheck_exit": code,
            "selfcheck_elapsed_s": round(time.perf_counter() - t0, 1),
        }
        CACHE.parent.mkdir(exist_ok=True)
        (CACHE.parent / "selfcheck.json").write_text(
            json.dumps({**out, "tail": tail}, indent=2)
        )
        return out


def main() -> None:
    import sys

    # bench is an entry point like the CLIs: use the persistent XLA compile
    # cache (utils.py keys it by host fingerprint). This is robustness, not
    # what the timings measure — every timed path warms its executables
    # in-process first, and the per-call jit-rebuild bug the round-3
    # import-time cache used to mask is fixed at the source (memoized step
    # builders in parallel/{tp,dp}.py).
    from fadtk_tpu.utils import configure_compile_cache

    configure_compile_cache()

    if "--selfcheck" in sys.argv:
        print(json.dumps(run_selfcheck_gate()))
        return
    if "--e2e" in sys.argv:
        # Standalone mode: the module contract is ONE JSON line on stdout
        # (docstring) and the driver parses it; don't follow the e2e line
        # with the headline line or pay for the family sweep here.
        print(json.dumps(bench_e2e()))
        return

    tpu = bench_tpu()
    cpu = bench_cpu_reference()
    if "--extra" in sys.argv:
        extra = bench_sqrtm_fad_inf()
        print(json.dumps(extra))

    # Multi-family sweep (throughput + MFU per family, f32/bf16). Default on;
    # set FADTK_BENCH_FAMILIES=0 to skip (e.g. when the remote compile service
    # is slow and only the headline number is needed). Failures inside the
    # sweep never break the headline line.
    families = None
    if "--families" in sys.argv or os.environ.get("FADTK_BENCH_FAMILIES", "1") == "1":
        try:
            families = bench_families()
        except Exception as e:
            print(f"# family sweep failed: {e}", flush=True)

    line = {
        "metric": "w2v2-base embedding throughput",
        "value": round(tpu, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(tpu / cpu, 2),
    }
    if families:
        # The driver captures only a ~4k-char stdout tail, so the headline
        # line must stay compact (round-3 verdict weak #1: the full sweep with
        # per-family prose notes arrived truncated and BENCH_r03 parsed as
        # null). Emit numbers only — audio-s/s and % of the measured matmul
        # roofline per family/dtype; the full entries (gflops, ms/call,
        # notes, errors) live in .bench_cache/families.json, written by
        # bench_families() above.
        compact: dict = {}
        if families.get("measured_matmul_tf"):
            compact["matmul_tf"] = families["measured_matmul_tf"]
        for name, per_dtype in families.items():
            if not isinstance(per_dtype, dict) or "float32" not in per_dtype:
                continue
            row = {}
            for dtype_name, short in (("float32", "f32"), ("bfloat16", "bf16")):
                e = per_dtype.get(dtype_name)
                if not isinstance(e, dict) or "audio_sec_per_sec" not in e:
                    continue
                row[short] = e["audio_sec_per_sec"]
                if "pct_of_measured_roofline" in e:
                    row[f"{short}_pct"] = e["pct_of_measured_roofline"]
            if row:
                compact[name] = row
        line["families"] = compact

    # Device-path numeric gate (r2 verdict #8): exit 0 = golden scores
    # reproduced on this backend; 2 = regression; -9 = timed out.
    # FADTK_BENCH_SELFCHECK=0 skips.
    if os.environ.get("FADTK_BENCH_SELFCHECK", "1") == "1":
        try:
            line.update(run_selfcheck_gate())
        except Exception as e:
            line["selfcheck_exit"] = None
            line["selfcheck_note"] = str(e)[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
