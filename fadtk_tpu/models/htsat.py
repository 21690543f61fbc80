"""HTSAT (hierarchical token-semantic audio transformer, Swin-style) in JAX.

This is the audio tower of both CLAP variants the reference registers:
LAION-CLAP's HTSAT-tiny/base (reference fadtk/model_loader.py:385) and
MS-CLAP 2023's HTSAT (:484,510). Semantics match HF transformers'
ClapAudioModel — itself the verified port of laion_clap's HTSAT — and are
differential-tested against it (tests/test_clap.py).

Pipeline (eval mode):
  (B, 1, T, mel) log-mel -> per-mel-bin batch norm -> bicubic time interp to
  spec_size*freq_ratio (align_corners, as a precomputed GEMM) -> 4-crop
  time->freq stacking into a (256, 256) image -> 4x4 patch embed + LN ->
  4 Swin stages (window attention with relative position bias, shifted windows
  with the static attention mask, patch merging) -> LN -> freq/time regroup ->
  global average pool = pooled embedding.

Everything is static-shape: window masks, relative-position index tables and
the interpolation matrix are host-precomputed constants per configuration.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    num_mel_bins: int = 64
    window_size: int = 8
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    embed_dim: int = 96  # patch_embeds_hidden_size; tiny=96, base=128
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def grid_size(self) -> int:
        return self.spec_size // self.patch_stride


HTSAT_TINY = HTSATConfig(embed_dim=96)
HTSAT_BASE = HTSATConfig(embed_dim=128)


# --------------------------------------------------------------------------- #
# Host-precomputed constants
# --------------------------------------------------------------------------- #


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch bicubic uses a=-0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2.0, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )
    return out


@lru_cache(maxsize=16)
def bicubic_interp_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) matrix == torch F.interpolate(..., mode='bicubic',
    align_corners=True) along one axis, with index clamping at the borders."""
    m = np.zeros((out_len, in_len))
    scale = (in_len - 1) / (out_len - 1) if out_len > 1 else 0.0
    for i in range(out_len):
        x = i * scale
        x0 = math.floor(x)
        for k in range(-1, 3):
            idx = min(max(x0 + k, 0), in_len - 1)
            m[i, idx] += _cubic_kernel(np.asarray(x - (x0 + k)))
    return m.astype(np.float32)


@lru_cache(maxsize=32)
def _relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (W*W, W*W)


@lru_cache(maxsize=64)
def _shift_attn_mask(height: int, width: int, window: int, shift: int) -> np.ndarray | None:
    """Static shifted-window attention mask (HF ClapAudioLayer.get_attn_mask):
    -100 between tokens from different source regions."""
    if shift == 0:
        return None
    img = np.zeros((height, width))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    # window partition
    img = img.reshape(height // window, window, width // window, window)
    windows = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (nW, WW, WW)


def _swin_merge_factor() -> int:
    """How many Swin windows share one attention call (1 = the literal
    per-window layout).

    Why: a Swin window is 64 tokens with head_dim 24/32, so the attention
    einsums are batches of (64, 24)x(24, 64) matmuls — ~4.7% of an MXU tile
    (64*24*64 / 128^3). The TPU ablation (scripts/htsat_breakdown2_probe.py,
    B=16 HTSAT-tiny bf16) puts that core at 2.73 ms of the 4.9 ms forward.
    Merging G windows into one attention call with a static block-diagonal
    mask raises tile utilization ~4x at G=2 (128-row tiles) for 2x softmax
    elements; the mask keeps the math per-window-exact (off-block logits at
    -1e9 underflow to exactly 0 after the softmax shift).

    Default 2 — the whole-model A/B (scripts/htsat_merge_probe.py, v5e,
    B=16 x 10 s windows, mel+tower+projection) won at G=2 in every config:
    tiny bf16 4.90 -> 3.75 ms (+31%), tiny f32 7.93 -> 7.12 (+11%),
    base bf16 6.21 -> 4.90 (+27%), base f32 10.21 -> 8.75 (+17%). G=4
    loses (tiny f32 9.84 ms): the doubled softmax/bias elements outgrow
    the tile-fill gain, which saturates once rows hit 128. Merged output
    is bit-identical to unmerged on CPU and pinned to 2e-6 in
    tests/test_clap.py. Override with FADTK_TPU_SWIN_MERGE=1 or 0 (both
    mean off) / 4. Read at trace time: set it before the first CLAP/msclap
    forward of the process — jitted executables keep their merge factor
    (harmless: merged and unmerged are numerically identical)."""
    raw = os.environ.get("FADTK_TPU_SWIN_MERGE", "").strip()
    if raw.isdigit():
        return max(int(raw), 1)  # 0 = off, same as 1
    return 2


@lru_cache(maxsize=16)
def _block_diag_bool(g: int, t: int) -> np.ndarray:
    """(g*t, g*t) boolean: True inside the g diagonal (t, t) blocks."""
    m = np.zeros((g * t, g * t), bool)
    for i in range(g):
        m[i * t : (i + 1) * t, i * t : (i + 1) * t] = True
    return m


_OFF_BLOCK = -1e9  # finite: exp(-1e9 - rowmax) flushes to exactly 0, no NaN


@lru_cache(maxsize=64)
def _merged_attn_mask(
    height: int, width: int, window: int, shift: int, g: int
) -> np.ndarray | None:
    """Additive attention mask for g merged windows: the per-window shift
    mask (HF semantics, 0 / -100) on the diagonal blocks, _OFF_BLOCK between
    tokens of different windows. g == 1 returns the plain shift mask."""
    base = _shift_attn_mask(height, width, window, shift)
    if g == 1:
        return base
    t = window * window
    nw = (height // window) * (width // window)
    out = np.full((nw // g, g * t, g * t), _OFF_BLOCK, np.float32)
    for grp in range(nw // g):
        for j in range(g):
            blk = 0.0 if base is None else base[grp * g + j]
            out[grp, j * t : (j + 1) * t, j * t : (j + 1) * t] = blk
    return out


# --------------------------------------------------------------------------- #
# Blocks
# --------------------------------------------------------------------------- #


def _ln(x, p, eps=1e-5):
    if x.dtype == jnp.bfloat16:
        # One-pass f32-accumulated moments, bf16 mode only (PERF.md §3.6):
        # LN is the Swin tower's largest VPU item (0.57 of 3.72 ms) and the
        # whole-model A/B measured 1.031x (ATTENTION_LEDGER_r05.json,
        # scripts/htsat_onepass_ln_probe.py; output deviation 2.5e-4, well
        # under bf16's own ~8e-3 rounding). f32 keeps two-pass moments: the
        # E[x^2]-E[x]^2 cancellation is not score-parity grade there (same
        # policy as the EnCodec group norm, §3.2).
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _window_partition(x, window):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(windows, window, h, w):
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _window_attention(cfg, p, x, num_heads, window, attn_mask, merge: int = 1):
    """x: (num_windows*B/merge, merge*WW, C).

    merge > 1 packs `merge` windows into one attention call; `attn_mask`
    then carries the _OFF_BLOCK wall between windows (see
    _swin_merge_factor) and the relative-position bias tiles over the
    diagonal blocks only. Per-window results are exact: off-block weights
    are exp(-1e9 - rowmax) == 0, adding zeros to the softmax sum."""
    nb, ww, c = x.shape
    hd = c // num_heads

    q = x @ p["query"]["kernel"] + p["query"]["bias"]
    k = x @ p["key"]["kernel"] + p["key"]["bias"]
    v = x @ p["value"]["kernel"] + p["value"]["bias"]

    def split(t):
        return t.reshape(nb, ww, num_heads, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhtd,bhsd->bhts", split(q), split(k), preferred_element_type=x.dtype
    ) / math.sqrt(hd)

    rel_idx = jnp.asarray(_relative_position_index(window).reshape(-1))
    wt = window * window
    bias = jnp.take(p["relative_position_bias_table"], rel_idx, axis=0)
    bias = bias.reshape(wt, wt, num_heads).transpose(2, 0, 1)
    if merge > 1:
        bd = jnp.asarray(_block_diag_bool(merge, wt))
        bias = jnp.where(bd[None], jnp.tile(bias, (1, merge, merge)), 0.0)
    logits = logits + bias[None]

    if attn_mask is not None:
        nw = attn_mask.shape[0]
        logits = logits.reshape(nb // nw, nw, num_heads, ww, ww)
        logits = logits + jnp.asarray(attn_mask)[None, :, None]
        logits = logits.reshape(nb, num_heads, ww, ww)

    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, split(v), preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(nb, ww, c)
    return out @ p["output"]["kernel"] + p["output"]["bias"]


def _swin_block(cfg, p, x, dims, num_heads, shift):
    """x: (B, H*W, C); pre-norm attention + MLP (HF ClapAudioLayer)."""
    h, w = dims
    window = cfg.window_size
    if min(h, w) <= window:
        shift, window = 0, min(h, w)

    b, _, c = x.shape
    shortcut = x
    y = _ln(x, p["layernorm_before"], cfg.layer_norm_eps).reshape(b, h, w, c)

    pad_r = (window - w % window) % window
    pad_b = (window - h % window) % window
    if pad_r or pad_b:
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))

    windows = _window_partition(y, window)
    nw = (hp // window) * (wp // window)
    g = math.gcd(_swin_merge_factor(), nw)
    mask = _merged_attn_mask(hp, wp, window, shift, g)
    if g > 1:
        windows = windows.reshape(-1, g * window * window, c)
    attn = _window_attention(
        cfg, p["attention"], windows, num_heads, window, mask, merge=g
    )
    y = _window_reverse(attn.reshape(-1, window, window, c), window, hp, wp)

    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    if pad_r or pad_b:
        y = y[:, :h, :w]
    x = shortcut + y.reshape(b, h * w, c)

    z = _ln(x, p["layernorm_after"], cfg.layer_norm_eps)
    from .precision import gelu

    z = gelu(z @ p["intermediate"]["kernel"] + p["intermediate"]["bias"])
    z = z @ p["mlp_output"]["kernel"] + p["mlp_output"]["bias"]
    return x + z


def _patch_merging(cfg, p, x, dims):
    h, w = dims
    b, _, c = x.shape
    y = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    parts = [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]]
    y = jnp.concatenate(parts, axis=-1).reshape(b, -1, 4 * c)
    y = _ln(y, p["norm"], cfg.layer_norm_eps)
    return y @ p["reduction"]["kernel"]


# --------------------------------------------------------------------------- #
# Full forward
# --------------------------------------------------------------------------- #


def htsat_forward(cfg: HTSATConfig, params, input_features: jax.Array) -> jax.Array:
    """(B, 1, T, mel) log-mel -> (B, num_features) pooled embedding.

    Mirrors HF ClapAudioEncoder.forward (pooler_output path).
    """
    b, ch, t, mel = input_features.shape
    assert ch == 1 and mel == cfg.num_mel_bins

    # Compute follows the parameter dtype (models/precision.py): the f32 mel
    # frontend output casts down here when the bf16 fast mode is active.
    from .precision import param_dtype

    # Per-mel-bin batch norm (eval: running stats).
    bn = params["batch_norm"]
    x = input_features.astype(param_dtype(params))
    x = (x - bn["mean"][None, None, None, :]) / jnp.sqrt(bn["var"][None, None, None, :] + 1e-5)
    x = x * bn["scale"][None, None, None, :] + bn["bias"][None, None, None, :]

    # reshape_mel2img: bicubic align-corners time interpolation to
    # spec_size * freq_ratio, then 4-crop stacking into a square image.
    spec_width = cfg.spec_size * cfg.freq_ratio  # e.g. 1024
    spec_height = cfg.spec_size // cfg.freq_ratio  # e.g. 64
    assert t <= spec_width, "input longer than the swin window"
    # The 4-crop restack below requires mel * freq_ratio == spec_size (all
    # registered CLAP configs satisfy it; HF would bicubic-interpolate the
    # frequency axis for mel < spec_height, a case no checkpoint uses).
    assert mel == spec_height, f"mel bins {mel} != spec_size/freq_ratio {spec_height}"
    if t < spec_width:
        interp = jnp.asarray(bicubic_interp_matrix(t, spec_width))
        x = jnp.einsum("ot,bcts->bcos", interp, x, preferred_element_type=x.dtype)
    # (B, 1, W, mel) -> (B, freq_ratio, W/freq_ratio, mel) -> (B, 1, mel*fr, W/fr)
    fr = cfg.freq_ratio
    x = x.reshape(b, fr, spec_width // fr, mel)
    x = x.transpose(0, 1, 3, 2).reshape(b, 1, mel * fr, spec_width // fr)

    # Patch embed: conv spec_size x spec_size image -> grid of patches + LN.
    pe = params["patch_embed"]
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 3, 1),  # NHWC
        pe["proj"]["kernel"],
        window_strides=(cfg.patch_stride, cfg.patch_stride),
        padding=[( (cfg.patch_size - cfg.patch_stride) // 2,) * 2] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ) + pe["proj"]["bias"]
    g = cfg.grid_size
    y = y.reshape(b, g * g, cfg.embed_dim)
    y = _ln(y, pe["norm"], cfg.layer_norm_eps)

    dims = (g, g)
    for i_stage, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[i_stage]
        for j, block in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window_size // 2
            y = _swin_block(cfg, block, y, dims, heads, shift)
        if "downsample" in stage:
            y = _patch_merging(cfg, stage["downsample"], y, dims)
            dims = ((dims[0] + 1) // 2, (dims[1] + 1) // 2)

    y = _ln(y, params["norm"], cfg.layer_norm_eps)

    # Frequency/time regroup + global average pool (HF ClapAudioEncoder tail).
    nchan = cfg.num_features
    frames_num = mel * fr
    down = 2 ** (len(cfg.depths) - 1)
    freq_shape = frames_num // down // cfg.patch_stride
    temporal_shape = frames_num // down // cfg.patch_stride
    y = y.transpose(0, 2, 1).reshape(b, nchan, freq_shape, temporal_shape)
    c_freq_bin = freq_shape // fr
    y = y.reshape(b, nchan, freq_shape // c_freq_bin, c_freq_bin, temporal_shape)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, nchan, c_freq_bin, -1)
    return jnp.mean(y.reshape(b, nchan, -1), axis=-1)


def clap_audio_projection(p, x: jax.Array) -> jax.Array:
    """HF ClapProjectionLayer: linear -> relu -> linear."""
    h = jax.nn.relu(x @ p["linear1"]["kernel"] + p["linear1"]["bias"])
    return h @ p["linear2"]["kernel"] + p["linear2"]["bias"]


# --------------------------------------------------------------------------- #
# Random init (tests / benchmarks)
# --------------------------------------------------------------------------- #


def init_htsat_params(cfg: HTSATConfig, key, dtype=jnp.float32, projection_dim: int | None = 512):
    keys = iter(jax.random.split(key, 8192))

    def dense(i, o, bias=True):
        s = 1.0 / math.sqrt(i)
        p = {"kernel": jax.random.uniform(next(keys), (i, o), dtype, -s, s)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def block(dim, heads):
        ww = (2 * cfg.window_size - 1) ** 2
        return {
            "layernorm_before": ln(dim),
            "attention": {
                "query": dense(dim, dim),
                "key": dense(dim, dim),
                "value": dense(dim, dim),
                "output": dense(dim, dim),
                "relative_position_bias_table": jax.random.normal(next(keys), (ww, heads), dtype) * 0.02,
            },
            "layernorm_after": ln(dim),
            "intermediate": dense(dim, int(dim * cfg.mlp_ratio)),
            "mlp_output": dense(int(dim * cfg.mlp_ratio), dim),
        }

    stages = []
    dim = cfg.embed_dim
    for i, depth in enumerate(cfg.depths):
        stage = {"blocks": [block(dim, cfg.num_heads[i]) for _ in range(depth)]}
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {"norm": ln(4 * dim), "reduction": dense(4 * dim, 2 * dim, bias=False)}
        stages.append(stage)
        if i < len(cfg.depths) - 1:
            dim *= 2

    params = {
        "batch_norm": {
            "mean": jnp.zeros((cfg.num_mel_bins,), dtype),
            "var": jnp.ones((cfg.num_mel_bins,), dtype),
            "scale": jnp.ones((cfg.num_mel_bins,), dtype),
            "bias": jnp.zeros((cfg.num_mel_bins,), dtype),
        },
        "patch_embed": {
            "proj": {
                "kernel": jax.random.normal(
                    next(keys), (cfg.patch_size, cfg.patch_size, 1, cfg.embed_dim), dtype
                ) * 0.02,
                "bias": jnp.zeros((cfg.embed_dim,), dtype),
            },
            "norm": ln(cfg.embed_dim),
        },
        "stages": stages,
        "norm": ln(cfg.num_features),
    }
    if projection_dim:
        params["audio_projection"] = {
            "linear1": dense(cfg.num_features, projection_dim),
            "linear2": dense(projection_dim, projection_dim),
        }
    return params
