"""Pallas TPU kernel: fused log-mel spectrogram.

The STFT+mel frontends (VGGish 64-mel, Whisper 80-mel, CLAP 64-mel) are two
GEMMs with elementwise ops between them:

    frames (N, W) -> re/im = frames @ DFT bases (W, F) -> power -> @ mel (F, M) -> log

XLA computes this as separate dots, materializing the (N, F) power spectrum in
HBM (dot-then-dot doesn't fuse). This kernel keeps the whole chain in VMEM per
128-frame tile: both DFT matmuls, the power combine, the mel projection and the
log run back-to-back on MXU/VPU without an HBM round-trip — the frontends'
arithmetic intensity is low enough that the saved (N, F) traffic is the win.

All operands are padded host-side to lane multiples (W, F, M -> multiples of
128); padding columns of the bases are zero so results are exact.

STATUS: retained as a reference kernel but NOT on the production path. The
frontends now avoid materializing the (N, W) frame tensor entirely via the
hop-decomposed framed GEMM (dsp/mel.py framed_basis_matmul), which measured
11x faster than patches+fused-kernel at the CLAP geometry on v5e — skipping
the window/hop-fold duplication beats fusing it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128  # frames per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(frames_ref, dre_ref, dim_ref, mel_ref, out_ref, *, log_mode: str,
            log_offset: float):
    f = frames_ref[:]
    re = jnp.dot(f, dre_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, dim_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    if log_mode == "ln_offset":  # VGGish: log(mel + offset)
        out = jnp.log(mel + log_offset)
    elif log_mode == "log10_clamp":  # Whisper: log10(max(mel, 1e-10))
        out = jnp.log(jnp.maximum(mel, 1e-10)) / np.log(10.0)
    elif log_mode == "db_clamp":  # torchlibrosa: 10*log10(max(mel, 1e-10))
        out = 10.0 * jnp.log(jnp.maximum(mel, 1e-10)) / np.log(10.0)
    else:
        raise ValueError(log_mode)
    out_ref[:] = out


@partial(jax.jit, static_argnames=("log_mode", "log_offset", "interpret"))
def fused_log_mel(
    frames: jax.Array,
    dft_re: jax.Array,
    dft_im: jax.Array,
    mel: jax.Array,
    *,
    log_mode: str,
    log_offset: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """(N, W) windowed frames -> (N, M) log-mel, single fused kernel.

    dft_re/dft_im: (W, F) window-folded DFT bases; mel: (F, M).
    """
    n, w = frames.shape
    f = dft_re.shape[1]
    m = mel.shape[1]
    wp, fp, mp = _round_up(w, _TILE), _round_up(f, _TILE), _round_up(m, _TILE)
    np_pad = _round_up(max(n, 1), _TILE)

    frames_p = jnp.zeros((np_pad, wp), jnp.float32).at[:n, :w].set(frames)
    dre_p = jnp.zeros((wp, fp), jnp.float32).at[:w, :f].set(dft_re)
    dim_p = jnp.zeros((wp, fp), jnp.float32).at[:w, :f].set(dft_im)
    mel_p = jnp.zeros((fp, mp), jnp.float32).at[:f, :m].set(mel)

    grid = (np_pad // _TILE,)
    out = pl.pallas_call(
        partial(_kernel, log_mode=log_mode, log_offset=log_offset),
        out_shape=jax.ShapeDtypeStruct((np_pad, mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames_p, dre_p, dim_p, mel_p)
    return out[:n, :m]


def pallas_available() -> bool:
    """Use the fused kernel on real TPU backends only (interpret mode exists
    for tests; CPU production path stays on plain XLA)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
