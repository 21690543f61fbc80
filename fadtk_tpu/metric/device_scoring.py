"""On-device bulk scoring: FAD-inf subsample sweep and per-song FAD.

These are the throughput modes of the two expensive scoring loops
(SURVEY.md 3.2/3.3). The host float64 paths in runner/fad.py remain the
reference-parity defaults; these device versions trade the last digits (float32
Newton-Schulz sqrtm, ~1e-3 relative) for keeping the whole sweep on the MXU:

- FAD-inf: the reference runs 25 x (subsample + np.cov + scipy sqrtm) on host
  (fadtk/fad.py:331-340). Here each step is a masked-Welford covariance (one
  GEMM over the frame matrix) + Newton-Schulz trace inside one lax.scan on
  device; only 25 scalars come back.
- per-song: per-file Gaussians and Frechet distances are vmapped in batches;
  the baseline sqrt is factored once (sqrtm(C1) reused across all songs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import _ns_sqrt_sym
from .stats import welford_finalize, welford_init, welford_update


@partial(jax.jit, static_argnames=("steps", "iters"))
def _fad_inf_scan(mu1, cov1, embeds, ns, key, steps: int, iters: int = 30):
    """embeds: (N, D) f32; ns: (steps,) i32. Returns (steps,) FAD scores."""
    n_total, d = embeds.shape
    max_n = n_total
    s1 = _ns_sqrt_sym((cov1 + cov1.T) * 0.5, iters)
    tr1 = jnp.trace(cov1)

    def step(carry, inputs):
        n_i, k = inputs
        idx = jax.random.randint(k, (max_n,), 0, n_total)
        sample = jnp.take(embeds, idx, axis=0)
        mask = (jnp.arange(max_n) < n_i).astype(jnp.float32)
        st = welford_update(welford_init(d), sample, mask)
        mu2, cov2 = welford_finalize(st)

        m = s1 @ cov2 @ s1
        tr_sqrt = jnp.trace(_ns_sqrt_sym((m + m.T) * 0.5, iters))
        diff = mu1 - mu2
        fad = jnp.dot(diff, diff) + tr1 + jnp.trace(cov2) - 2.0 * tr_sqrt
        return carry, fad

    keys = jax.random.split(key, steps)
    _, fads = jax.lax.scan(step, None, (ns, keys))
    return fads


def fad_inf_device(
    mu_base: np.ndarray,
    cov_base: np.ndarray,
    embeds: np.ndarray,
    steps: int = 25,
    min_n: int = 500,
    seed: int = 0,
) -> tuple[float, float, float, list[tuple[int, float]]]:
    """Device FAD-inf sweep. Returns (score, slope, r2, points) — the same
    1/n linear extrapolation as the reference (fadtk/fad.py:343-351)."""
    max_n = len(embeds)
    ns = np.array([int(n) for n in np.linspace(min_n, max_n, steps)], np.int32)

    fads = np.asarray(
        _fad_inf_scan(
            jnp.asarray(mu_base, jnp.float32),
            jnp.asarray(cov_base, jnp.float32),
            jnp.asarray(np.asarray(embeds), jnp.float32),
            jnp.asarray(ns),
            jax.random.PRNGKey(seed),
            steps=steps,
        ),
        dtype=np.float64,
    )

    xs = 1.0 / ns.astype(np.float64)
    slope, intercept = np.polyfit(xs, fads, 1)
    r2 = 1 - np.sum((fads - (slope * xs + intercept)) ** 2) / np.sum(
        (fads - np.mean(fads)) ** 2
    )
    points = [(int(n), float(f)) for n, f in zip(ns, fads)]
    return float(intercept), float(slope), float(r2), points


@partial(jax.jit, static_argnames=("iters",))
def _per_song_batch(mu1, s1, tr1, frames, masks, iters: int = 30):
    """frames: (B, L, D) padded per-song frames; masks: (B, L)."""

    def one(song_frames, mask):
        d = song_frames.shape[-1]
        st = welford_update(welford_init(d), song_frames, mask)
        mu2, cov2 = welford_finalize(st)
        m = s1 @ cov2 @ s1
        tr_sqrt = jnp.trace(_ns_sqrt_sym((m + m.T) * 0.5, iters))
        diff = mu1 - mu2
        return jnp.dot(diff, diff) + tr1 + jnp.trace(cov2) - 2.0 * tr_sqrt

    return jax.vmap(one)(frames, masks)


def per_song_fad_device(
    mu_base: np.ndarray,
    cov_base: np.ndarray,
    song_embeddings: list[np.ndarray],
    batch_size: int = 16,
) -> np.ndarray:
    """FAD of each song's own Gaussian against the baseline, batched on device
    (the device mode of score_individual, reference fadtk/fad.py:373-387)."""
    mu1 = jnp.asarray(mu_base, jnp.float32)
    cov1 = jnp.asarray(cov_base, jnp.float32)
    s1 = _ns_sqrt_sym((cov1 + cov1.T) * 0.5, 30)
    tr1 = jnp.trace(cov1)

    d = song_embeddings[0].shape[-1]
    scores = np.empty(len(song_embeddings), np.float64)
    for start in range(0, len(song_embeddings), batch_size):
        group = song_embeddings[start : start + batch_size]
        pad_len = max(e.shape[0] for e in group)
        frames = np.zeros((len(group), pad_len, d), np.float32)
        masks = np.zeros((len(group), pad_len), np.float32)
        for j, e in enumerate(group):
            frames[j, : e.shape[0]] = np.asarray(e, np.float32)
            masks[j, : e.shape[0]] = 1.0
        out = _per_song_batch(mu1, s1, tr1, jnp.asarray(frames), jnp.asarray(masks))
        scores[start : start + len(group)] = np.asarray(out, np.float64)
    return scores
