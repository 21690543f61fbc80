"""Kaiser-windowed sinc polyphase resampler.

Numerically equivalent to torchaudio's ``sinc_interp_kaiser`` resampler with the
exact constants the reference pins for SoX-HQ parity (reference
fadtk/fad.py:151-158): ``lowpass_filter_width=64``,
``rolloff=0.9475937167399596``, ``beta=14.769656459379492``.

Design (TPU-first):

- The polyphase filter bank is built once on host in float64 and cached per
  (sr_in, sr_out) pair; it is a dense ``(L, 1, K)`` tensor (L = output phases per
  input block, K = taps).
- Application is a strided conv, which XLA lowers onto the MXU as an implicit
  GEMM: input framed into (n_blocks, K) windows x (K, L) filters. No scalar
  loops, fully static shapes.
- The algorithm matches torchaudio functional ``resample``: gcd reduction, the
  same index grid, the same Kaiser window (i0), the same edge padding
  (width, width + orig) and the same ceil-based output length.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import i0 as _i0

# Reference resampling constants (fadtk/fad.py:154-157).
LOWPASS_FILTER_WIDTH = 64
ROLLOFF = 0.9475937167399596
KAISER_BETA = 14.769656459379492


@lru_cache(maxsize=64)
def kaiser_sinc_kernel(
    sr_in: int,
    sr_out: int,
    lowpass_filter_width: int = LOWPASS_FILTER_WIDTH,
    rolloff: float = ROLLOFF,
    beta: float = KAISER_BETA,
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel.

    Returns (kernels, width, orig, new) where kernels has shape
    (new, 2*width + orig) — one FIR per output phase — and orig/new are the
    gcd-reduced rates. Mirrors torchaudio's `_get_sinc_resample_kernel` math,
    computed in float64 then cast to float32 (torchaudio builds the kernel in
    the waveform dtype; float64 construction only reduces rounding noise below
    the 16-bit PCM quantization that follows in the cache, fadtk/fad.py:160).
    """
    gcd = math.gcd(int(sr_in), int(sr_out))
    orig = int(sr_in) // gcd
    new = int(sr_out) // gcd

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    # t[p, k] = (-p/new + (k - width)/orig) * base_freq, p in [0, new), k taps.
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig  # (K,)
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = _i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / _i0(beta)
    tpi = t * math.pi
    scale = base_freq / orig
    kernels = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
    kernels = kernels * window * scale
    return kernels.astype(np.float32), width, orig, new


@partial(jax.jit, static_argnames=("sr_in", "sr_out"))
def _resample_device(x: jax.Array, sr_in: int, sr_out: int) -> jax.Array:
    """Resample a batch (B, T) of waveforms on device.

    Formulated as explicit framing + ONE GEMM (like the mel frontend,
    dsp/mel.py) rather than a strided conv: common audio ratios make the conv
    degenerate — 44.1k->16k is stride 441 with a 1256-tap kernel, which XLA's
    TPU conv path compiles pathologically (measured: the compile hangs for
    minutes on the real chip; the framed GEMM compiles in seconds and runs on
    the MXU). Window j covers input [j*orig, j*orig + K); stacking
    ceil(K/orig) shifted reshapes of the padded signal materializes the
    (B, n_blocks, K) frame tensor, then (K, new) filters apply as a single
    matmul.
    """
    kernels, width, orig, new = kaiser_sinc_kernel(sr_in, sr_out)
    kt = jnp.asarray(kernels).T  # (K, new)
    taps = kt.shape[0]

    b, length = x.shape
    x = jnp.pad(x, ((0, 0), (width, width + orig)))
    n_blocks = (x.shape[1] - taps) // orig + 1
    n_stack = -(-taps // orig)  # ceil: shifted orig-blocks covering K taps
    need = (n_blocks + n_stack) * orig
    x = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))
    parts = [
        x[:, i * orig : (i + n_blocks) * orig].reshape(b, n_blocks, orig)
        for i in range(n_stack)
    ]
    windows = jnp.concatenate(parts, axis=-1)[:, :, :taps]  # (B, nb, K)
    out = jnp.einsum(
        "bnk,kp->bnp",
        windows,
        kt,
        preferred_element_type=jnp.float32,
        # True f32 accumulation: the TPU default (bf16 MXU passes) would put
        # ~1e-3 relative error on samples that a 16-bit PCM quantization
        # follows (needs ~3e-5). The filter is tiny; HIGHEST costs nothing.
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, -1)  # phases interleave along the last axis
    target_len = int(math.ceil(new * length / orig))
    return out[:, :target_len]


def resample_kaiser(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Resample waveforms on the HOST (numpy/BLAS). Identity when rates match.

    This is the convert/cache path (runner.fad.load_audio). It deliberately
    does NOT touch the accelerator: each call would otherwise pay one tunneled
    device dispatch (~25 ms here) plus a fresh XLA compile per distinct clip
    length, which caps dataset conversion at ~40 files/s regardless of CPU
    count. The polyphase application is the same framed GEMM as the device
    path — (n_blocks, K) windows x (K, new) filters — executed by BLAS sgemm
    in bounded chunks, so decode threads scale it across cores. The on-device
    pipeline keeps using ``resample_batch``.
    """
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    kernels, width, orig, new = kaiser_sinc_kernel(int(sr_in), int(sr_out))
    x = np.asarray(x, dtype=np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    b, length = x.shape
    xp = np.pad(x, ((0, 0), (width, width + orig)))
    taps = kernels.shape[1]
    n_blocks = (xp.shape[1] - taps) // orig + 1
    if taps > 8 * orig:
        # Small-orig ratios (48k->24k, 44.1k->22.05k: orig=2, taps=274) make
        # the window matrix a taps/orig ~ 137x data amplification — the GEMM
        # path is copy-bound there (795 ms for 10 s at 48k->24k). Few phases
        # (new <= orig) means per-phase overlap-add FFT convolution wins:
        # y[m*new + p] = (xp * kernels[p])[m*orig + taps - 1]. ~8 ms for the
        # same clip, identical math to FFT roundoff (~1e-7, far below the
        # 16-bit PCM quantization that follows).
        from scipy.signal import oaconvolve

        out = np.empty((b, n_blocks * new), np.float32)
        for p in range(new):
            conv = oaconvolve(xp, kernels[p : p + 1, ::-1], axes=-1)
            out[:, p::new] = conv[
                :, taps - 1 : taps - 1 + n_blocks * orig : orig
            ].astype(np.float32, copy=False)
    else:
        # (b, n_blocks, taps) strided view; GEMM chunks bound the materialized
        # copy to ~32 MB. The explicit copy before each GEMM is load-bearing:
        # numpy's matmul on the strided window VIEW falls off the BLAS path
        # entirely (measured 180 ms for a 10 s 44.1k->16k clip vs 6.8 ms for
        # copy+sgemm on the same data — round 3).
        windows = np.lib.stride_tricks.sliding_window_view(xp, taps, axis=1)[:, ::orig]
        kt = kernels.T  # (taps, new)
        out = np.empty((b, n_blocks * new), np.float32)
        chunk = max(1, (1 << 23) // max(taps, 1))
        for s in range(0, n_blocks, chunk):
            e = min(s + chunk, n_blocks)
            block = np.ascontiguousarray(windows[:, s:e])
            out[:, s * new : e * new] = (block @ kt).reshape(b, -1)
    target_len = int(math.ceil(new * length / orig))
    y = out[:, :target_len]
    return y[0] if squeeze else y


def resample_batch(x: jax.Array, sr_in: int, sr_out: int) -> jax.Array:
    """Device API for the batched pipeline: (B, T) -> (B, T')."""
    if sr_in == sr_out:
        return x
    return _resample_device(x, int(sr_in), int(sr_out))


def resampled_length(n: int, sr_in: int, sr_out: int) -> int:
    """Output length of resampling an n-sample clip (torchaudio's ceil rule)."""
    gcd = math.gcd(int(sr_in), int(sr_out))
    return int(math.ceil((sr_out // gcd) * n / (sr_in // gcd)))


def source_samples_needed(n_out: int, sr_in: int, sr_out: int) -> int:
    """Source samples whose values the first ``n_out`` output samples depend
    on: truncating the source here (instead of resampling the full clip and
    truncating the output) leaves those outputs bit-identical — output i reads
    source indices < i*orig/new + width + 1, and the polyphase kernel pads the
    tail with zeros beyond the signal either way."""
    gcd = math.gcd(int(sr_in), int(sr_out))
    orig, new = sr_in // gcd, sr_out // gcd
    _, width, _, _ = kaiser_sinc_kernel(int(sr_in), int(sr_out))
    return int(math.ceil(n_out * orig / new)) + width + orig


@partial(jax.jit, static_argnames=("sr_in", "sr_out"))
def convert_device(x: jax.Array, sr_in: int, sr_out: int) -> jax.Array:
    """The convert-cache transform ON DEVICE: (B, T_src) mono batches ->
    (B, T_dst) int16, i.e. Kaiser resample + the cached wav's 16-bit PCM
    quantization (scale 32768, round-half-even, clamp — audio/wavio.py
    float_to_int16; exact in float32 since |values| < 2^15 << 2^24).

    ``x`` may be int16 (source audio that is 16-bit-PCM-exact ships at half
    the bytes and rescales on device, bit-identically) or float32.

    Numerics vs the host convert path (runner/fad.py load_audio): the same
    polyphase filter bank, but XLA's conv accumulation order differs from the
    host BLAS GEMM, so ~0.1% of samples land one int16 LSB apart (measured
    max |diff| ~5e-7 pre-quantization). Scores move O(1e-6) — far inside the
    device pipeline's float32-accumulation contract; the host cached path
    remains the bit-parity reference.
    """
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * (1.0 / 32768.0)
    if sr_in != sr_out:
        x = _resample_device(x, int(sr_in), int(sr_out))
    q = jnp.clip(jnp.round(x * 32768.0), -32768.0, 32767.0)
    return q.astype(jnp.int16)
