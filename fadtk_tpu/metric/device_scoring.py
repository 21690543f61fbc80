"""On-device bulk scoring: FAD-inf subsample sweep and per-song FAD.

These are the throughput modes of the two expensive scoring loops
(SURVEY.md 3.2/3.3). The host float64 paths in runner/fad.py remain the
reference-parity defaults; these device versions trade the last digits
(float32 accumulation, ~1e-3 relative) for keeping the whole sweep on device:

- FAD-inf: the reference runs 25 x (subsample + np.cov + scipy sqrtm) on host
  (fadtk/fad.py:331-340). Here each step is a masked-Welford covariance (one
  GEMM over the frame matrix) + an eigvalsh trace inside one lax.scan on
  device; only 25 scalars come back.
- per-song: per-file Gaussians and Frechet distances are vmapped in batches;
  the baseline sqrt is factored once (sqrtm(C1) reused across all songs).

Rank-deficiency note: a song with fewer frames than embedding dims (the
NORMAL case — Whisper yields 2 frames, CLAP ~1 frame/s, speech ~50 frames/s
against d = 512-1280) has a singular covariance, and the plain Newton-Schulz
iteration diverges to NaN on singular PSD input (z-blowup along the null
space). Traces here therefore come from exact eigenvalues: per song via the
(L, L) GRAM of the sqrt-projected frames — same nonzero spectrum as the
(d, d) product, cheaper whenever L < d, and zero eigenvalues are clipped
exactly; the FAD-inf sweep uses eigvalsh of the (d, d) product (its sample
counts reach far past d). Newton-Schulz remains for the full-dataset scoring
path where n >> d guarantees full rank.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import _ns_sqrt_sym
from .stats import (
    welford_finalize,
    welford_init,
    welford_merge_across,
    welford_update,
)


@jax.jit
def _sqrt_psd_eigh(m: jax.Array) -> jax.Array:
    """Exact PSD square root via eigendecomposition (safe for singular input,
    unlike Newton-Schulz; computed once per baseline, so speed is moot)."""
    ev, u = jnp.linalg.eigh((m + m.T) * 0.5)
    return (u * jnp.sqrt(jnp.clip(ev, 0.0, None))) @ u.T


def _fad_trace_step(mu1, s1, tr1, n_i, d, mu2, cov2):
    """FAD of (mu2, cov2) against the factored baseline, trace path chosen by
    sample size: subsample sizes below d (min_n=500 vs d up to 1280) make cov2
    singular, where Newton-Schulz NaNs — those points take the exact eigvalsh
    trace. Well-sampled points (n >= 4d: full-rank with margin) keep the ~2x
    faster pure-matmul NS trace."""
    m = s1 @ cov2 @ s1
    msym = (m + m.T) * 0.5
    tr_sqrt = jax.lax.cond(
        n_i >= 4 * d,
        lambda mm: jnp.trace(_ns_sqrt_sym(mm, 30)),
        lambda mm: jnp.sum(jnp.sqrt(jnp.clip(jnp.linalg.eigvalsh(mm), 0.0, None))),
        msym,
    )
    diff = mu1 - mu2
    return jnp.dot(diff, diff) + tr1 + jnp.trace(cov2) - 2.0 * tr_sqrt


def _fad_inf_steps(mu1, cov1, embeds, ns, keys):
    """embeds: (N, D) f32 or f16; ns/keys: (steps,). Returns (steps,) FADs.

    Single-device sweep: one lax.scan over the ns grid, each step a
    with-replacement subsample + masked Welford + trace. f16 frames (the
    on-disk cache dtype) stay f16 in HBM and upcast AFTER the gather —
    f16->f32 is exact, so scores are bit-identical to upcasting on host,
    at half the transfer bytes and half the resident matrix."""
    n_total, d = embeds.shape
    max_n = n_total
    s1 = _sqrt_psd_eigh(cov1)
    tr1 = jnp.trace(cov1)

    def step(carry, inputs):
        n_i, k = inputs
        idx = jax.random.randint(k, (max_n,), 0, n_total)
        sample = jnp.take(embeds, idx, axis=0).astype(jnp.float32)
        mask = (jnp.arange(max_n) < n_i).astype(jnp.float32)
        st = welford_update(welford_init(d), sample, mask)
        mu2, cov2 = welford_finalize(st)
        return carry, _fad_trace_step(mu1, s1, tr1, n_i, d, mu2, cov2)

    _, fads = jax.lax.scan(step, None, (ns, keys))
    return fads


_fad_inf_scan = jax.jit(_fad_inf_steps)


def _fad_inf_steps_dp(mu1, cov1, embeds_local, valid_local, quotas, ns, keys):
    """dp-sharded sweep body: each chip holds ONLY its (Nl, D) shard of the
    frame matrix (round-3 verdict #1 — the replicated (N, D) matrix could not
    fit north-star datasets: fma_pop-scale N*D*4 B runs to tens of GB, past a
    chip's HBM, while sharded HBM drops as N/dp).

    Per sweep step, every chip draws its host-computed quota of the global
    subsample (with replacement, uniform within its shard; quotas split
    n_i proportionally to shard valid counts, so the union is uniform over
    the dataset), folds a local masked-Welford partial, and one psum
    (stats.welford_merge_across — the generalized Chan identity) produces the
    step's global (mu, cov). The (d, d) trace math then runs replicated.

    Statistically identical to the single-device sweep (same estimator, same
    1/n bias structure); NOT bit-identical (different draws compose the
    subsample) — seeded reproducibility holds per (seed, mesh shape).

    embeds_local: (Nl, D) this chip's rows (zero-padded); valid_local: (1,)
    count of valid rows here; quotas: (steps, dp) per-chip draw counts
    (replicated, exact-integer host split summing to ns); ns/keys: (steps,)
    replicated. Returns (steps,) FADs, identical on every chip.
    """
    cap, d = embeds_local.shape
    s1 = _sqrt_psd_eigh(cov1)
    tr1 = jnp.trace(cov1)
    shard = jax.lax.axis_index("dp")
    v = valid_local[0]

    def step(carry, inputs):
        n_i, k, quota_row = inputs
        n_local = quota_row[shard]
        # quota <= valid (floor-diff split), so a (cap,) buffer always fits.
        idx = jax.random.randint(
            jax.random.fold_in(k, shard), (cap,), 0, jnp.maximum(v, 1)
        )
        sample = jnp.take(embeds_local, idx, axis=0).astype(jnp.float32)
        mask = (jnp.arange(cap) < n_local).astype(jnp.float32)
        st = welford_update(welford_init(d), sample, mask)
        st = welford_merge_across(st, "dp")
        mu2, cov2 = welford_finalize(st)
        return carry, _fad_trace_step(mu1, s1, tr1, n_i, d, mu2, cov2)

    _, fads = jax.lax.scan(step, None, (ns, keys, quotas))
    return fads


@lru_cache(maxsize=8)
def _fad_inf_sharded(mesh):
    """FRAMES sharded over the mesh's dp axis; the sweep runs collectively
    (per-step psum-merged Welford). Per-chip HBM = N/dp rows + one sample
    buffer, vs the full (N, D) replica of the round-3 design.

    Cached per mesh (Mesh is hashable): the returned jit wrapper keys XLA's
    executable cache, so repeated sweeps don't recompile."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        shard_map(
            _fad_inf_steps_dp,
            mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp"), P(), P(), P()),
            out_specs=P(),
            # welford_merge_across's psums make the output replicated.
            check_vma=False,
        )
    )


def _dp_quota_split(ns: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Exact integer split of each subsample size proportional to shard valid
    counts: floor-diff over the prefix sums. Each row sums to exactly n_i and
    each chip's quota <= its valid count (so a (Nl,) sample buffer always
    fits). Returns (steps, dp) int32."""
    cum = np.concatenate([[0], np.cumsum(np.asarray(valid, np.int64))])
    edges = np.asarray(ns, np.int64)[:, None] * cum[None, :] // max(cum[-1], 1)
    return np.diff(edges, axis=1).astype(np.int32)


def fad_inf_device(
    mu_base: np.ndarray,
    cov_base: np.ndarray,
    embeds: np.ndarray,
    steps: int = 25,
    min_n: int = 500,
    seed: int = 0,
    mesh=None,
) -> tuple[float, float, float, list[tuple[int, float]]]:
    """Device FAD-inf sweep. Returns (score, slope, r2, points) — the same
    1/n linear extrapolation as the reference (fadtk/fad.py:343-351).

    ``mesh``: optional (dp, tp) Mesh — the FRAME MATRIX shards across dp
    chips (per-chip HBM ~ N/dp, so fma_pop-scale datasets fit), and each
    sweep step is a collective: per-chip quota subsample -> local Welford ->
    one psum merge. Sharded scores are statistically equivalent to (not
    bit-identical with) the single-device sweep; both are seeded."""
    max_n = len(embeds)
    ns = np.array([int(n) for n in np.linspace(min_n, max_n, steps)], np.int32)
    keys = jax.random.split(jax.random.PRNGKey(seed), steps)

    mu1 = jnp.asarray(mu_base, jnp.float32)
    cov1 = jnp.asarray(cov_base, jnp.float32)
    # f16 frames (the on-disk embedding-cache dtype, reference
    # fadtk/model_loader.py:47-48) ship AND shard as f16: half the link
    # bytes and half the per-chip HBM vs an f32 matrix, bit-identical
    # scores (the sweep steps upcast after the gather; f16->f32 is exact).
    embeds = np.asarray(embeds)
    if embeds.dtype != np.float16:
        embeds = np.asarray(embeds, np.float32)
    if mesh is not None and mesh.shape["dp"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        nl = -(-max_n // dp)  # rows per chip (last shard zero-padded)
        valid = np.clip(max_n - nl * np.arange(dp), 0, nl).astype(np.int32)
        quotas = _dp_quota_split(ns, valid)  # (steps, dp)
        padded = np.zeros((nl * dp, embeds.shape[1]), embeds.dtype)
        padded[:max_n] = embeds
        sharded_rows = jax.device_put(padded, NamedSharding(mesh, P("dp")))
        fads = np.asarray(
            _fad_inf_sharded(mesh)(
                mu1, cov1, sharded_rows,
                jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P("dp"))),
                jnp.asarray(quotas), jnp.asarray(ns), keys,
            ),
            dtype=np.float64,
        )
    else:
        fads = np.asarray(
            _fad_inf_scan(mu1, cov1, jnp.asarray(embeds), jnp.asarray(ns), keys),
            np.float64,
        )

    xs = 1.0 / ns.astype(np.float64)
    slope, intercept = np.polyfit(xs, fads, 1)
    r2 = 1 - np.sum((fads - (slope * xs + intercept)) ** 2) / np.sum(
        (fads - np.mean(fads)) ** 2
    )
    points = [(int(n), float(f)) for n, f in zip(ns, fads)]
    return float(intercept), float(slope), float(r2), points


@partial(jax.jit, static_argnames=())
def _per_song_batch(mu1, s1, tr1, frames, masks):
    """frames: (B, L, D) padded per-song frames (any float dtype; accumulated
    in float32); masks: (B, L).

    Per-song covariances are singular whenever a song has fewer frames than
    dims (Whisper: 2 frames), so Tr sqrt comes from the exact nonzero
    spectrum of W = centered_frames @ s1 / sqrt(n-1): spec+(W Wt) ==
    spec+(Wt W) == spec+(s1 C2 s1). The Gram side is chosen statically per
    pad bucket — (L, L) when L <= D, else the (D, D) product — so
    frame-dense families (encodec at 75 Hz: minutes of audio = 10k+ frames)
    never materialize an (L, L) matrix (a (B, 13k, 13k) f32 batch would OOM
    the chip). Masked rows are exact zero rows of W and clip away."""

    def one(song_frames, mask):
        song_frames = song_frames.astype(jnp.float32)
        n = mask.sum()
        mu2 = (song_frames * mask[:, None]).sum(0) / jnp.maximum(n, 1.0)
        xc = (song_frames - mu2) * mask[:, None]
        w = (xc @ s1) / jnp.sqrt(jnp.maximum(n - 1.0, 1.0))
        gram = w @ w.T if w.shape[0] <= w.shape[1] else w.T @ w
        ev = jnp.linalg.eigvalsh((gram + gram.T) * 0.5)
        tr_sqrt = jnp.sum(jnp.sqrt(jnp.clip(ev, 0.0, None)))
        tr_cov2 = jnp.sum(xc * xc) / jnp.maximum(n - 1.0, 1.0)
        diff = mu1 - mu2
        return jnp.dot(diff, diff) + tr1 + tr_cov2 - 2.0 * tr_sqrt

    return jax.vmap(one)(frames, masks)


class PerSongScorer:
    """Streaming per-song FAD against one baseline.

    Factors sqrtm(C_base) once (exact eigh sqrt) and scores arbitrarily many
    song batches against it — the runner streams file windows through
    ``score_batch`` so RAM stays bounded by the window, never O(dataset)
    (reference fadtk/fad.py:373-387 holds one song at a time; the round-1
    device path regressed to loading everything).

    Pad lengths bucket to multiples of ``len_bucket`` frames so the jitted
    batch kernel compiles a handful of times, not once per window (masked
    Welford makes padding exact). Frames ship as float16 — their on-disk
    cache dtype (reference fadtk/model_loader.py:47-48) — halving
    host->device transfer; the device casts to float32 before accumulating,
    so scores are unchanged.
    """

    def __init__(
        self,
        mu_base: np.ndarray,
        cov_base: np.ndarray,
        batch_size: int = 16,
        len_bucket: int = 128,
        mesh=None,
    ):
        """``mesh``: optional (dp, tp) Mesh — songs within a batch shard over
        the dp axis (per-song math is independent, so sharded == single-device
        scores); the per-dispatch batch scales to batch_size x dp."""
        self.mu1 = jnp.asarray(mu_base, jnp.float32)
        cov1 = jnp.asarray(cov_base, jnp.float32)
        self.s1 = _sqrt_psd_eigh(cov1)
        self.tr1 = jnp.trace(cov1)
        self.mesh = mesh if (mesh is not None and mesh.shape["dp"] > 1) else None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self._data_sharding = NamedSharding(self.mesh, P("dp"))
            self.mu1 = jax.device_put(self.mu1, rep)
            self.s1 = jax.device_put(self.s1, rep)
            self.tr1 = jax.device_put(self.tr1, rep)
            batch_size *= self.mesh.shape["dp"]
        self.batch_size = batch_size
        self.len_bucket = len_bucket

    def score_batch(self, song_embeddings: list[np.ndarray]) -> np.ndarray:
        d = song_embeddings[0].shape[-1]
        scores = np.empty(len(song_embeddings), np.float64)
        bs = self.batch_size
        for start in range(0, len(song_embeddings), bs):
            group = song_embeddings[start : start + bs]
            longest = max(e.shape[0] for e in group)
            pad_len = -(-longest // self.len_bucket) * self.len_bucket
            frames = np.zeros((bs, pad_len, d), np.float16)
            masks = np.zeros((bs, pad_len), np.float32)
            for j, e in enumerate(group):
                frames[j, : e.shape[0]] = np.asarray(e, np.float16)
                masks[j, : e.shape[0]] = 1.0
            frames, masks = jnp.asarray(frames), jnp.asarray(masks)
            if self.mesh is not None:
                frames = jax.device_put(frames, self._data_sharding)
                masks = jax.device_put(masks, self._data_sharding)
            out = _per_song_batch(self.mu1, self.s1, self.tr1, frames, masks)
            scores[start : start + len(group)] = np.asarray(
                out[: len(group)], np.float64
            )
        return scores


def per_song_fad_device(
    mu_base: np.ndarray,
    cov_base: np.ndarray,
    song_embeddings: list[np.ndarray],
    batch_size: int = 16,
) -> np.ndarray:
    """FAD of each song's own Gaussian against the baseline, batched on device
    (the device mode of score_individual, reference fadtk/fad.py:373-387)."""
    return PerSongScorer(mu_base, cov_base, batch_size=batch_size).score_batch(
        song_embeddings
    )
