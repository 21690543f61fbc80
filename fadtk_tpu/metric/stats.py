"""Gaussian statistics of embedding frames.

Two implementations, one contract:

1. **Host-exact path** (numpy): replicates the reference's numerics so that scores
   match to the last ulp. The reference computes per-file partials
   ``(mean, cov*(n-1), n)`` and merges them sequentially with the Chan et al.
   parallel-update formula (reference fadtk/utils.py:13-46); in-memory statistics
   are plain ``np.mean`` + ``np.cov`` (reference fadtk/fad.py:42-48).

2. **Device path** (JAX): a streaming, mask-aware Welford/Chan accumulator whose
   per-batch second moment is a single MXU matmul, merged across chips with a
   single ``psum`` using the generalized Chan identity

       mu  = (sum_i n_i mu_i) / n
       M2  = sum_i [ M2_i + n_i (mu_i - mu)(mu_i - mu)^T ]

   which is algebraically identical to folding the reference's pairwise merge
   (fadtk/utils.py:36-40) over all shards at once.

State convention (both paths): ``(mu, M2, n)`` with ``cov = M2 / (n - 1)``.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import PathLike

# --------------------------------------------------------------------------- #
# Host-exact path (reference numerics)
# --------------------------------------------------------------------------- #


def calc_embd_statistics(embd: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Mean and unbiased covariance of a (n_frames, n_features) array.

    Parity: reference fadtk/fad.py:42-48 — including the float16 mean dtype when
    the input is float16 (np.mean uses float32 intermediates and casts back,
    which the golden scores depend on) and the float64 covariance from np.cov.
    """
    assert embd.shape[0] >= 2, (
        f"FAD requires at least two embedding frames, you have {embd.shape}. "
        "(This probably means that your audio is too short)"
    )
    return np.mean(embd, axis=0), np.cov(embd, rowvar=False)


def file_partial_stats(file: PathLike) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-file partial statistics ``(mean, cov*(n-1), n)``.

    Parity: reference fadtk/utils.py:13-16.
    """
    embd = np.load(file)
    n = embd.shape[0]
    return np.mean(embd, axis=0), np.cov(embd, rowvar=False) * (n - 1), n


def merge_partial_stats(
    mu: np.ndarray, s: np.ndarray, n: int, mu_b: np.ndarray, s_b: np.ndarray, n_b: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Chan et al. pairwise merge of two ``(mu, M2, n)`` partials.

    Parity: the update inside the loop of reference fadtk/utils.py:36-40.
    """
    delta = mu_b - mu
    mu = mu + n_b / (n + n_b) * delta
    s = s + s_b + np.outer(delta, delta) * n * n_b / (n + n_b)
    return mu, s, n + n_b


def merge_partial_stats_device(state, mu_b, m2_or_cov_b, n_b, b_is_cov: bool = False):
    """Device-resident Chan merge chain (same formula as above, float32).

    Keeping the running (mu, M2, n) ON DEVICE makes the accumulation loop
    fully asynchronous: the host never fetches per-batch partials, so decode
    threads and device embedding steps overlap through jax's dispatch queue
    (one final fetch syncs at the end). ``state=None`` starts the chain.
    ``b_is_cov=True`` accepts a finalized covariance for the incoming partial
    (the sharded speech step's output) and rescales to M2 inside the same jit
    — no extra dispatch. The host float64 chain remains the parity path; this
    one serves the device pipeline whose contract is float32 accumulation.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    global _merge_jit
    if _merge_jit is None:

        @_partial(jax.jit, static_argnames=("b_is_cov",))
        def _merge(mu_a, m2_a, n_a, mu_b, m2_b, n_b, b_is_cov):
            mu_b = mu_b.astype(jnp.float32)
            m2_b = m2_b.astype(jnp.float32)
            n_b = n_b.astype(jnp.float32)
            if b_is_cov:
                m2_b = m2_b * jnp.maximum(n_b - 1.0, 0.0)
            n = n_a + n_b
            safe = jnp.maximum(n, 1.0)
            delta = mu_b - mu_a
            mu = mu_a + delta * (n_b / safe)
            m2 = m2_a + m2_b + jnp.outer(delta, delta) * (n_a * n_b / safe)
            return mu, m2, n

        _merge_jit = _merge

    if state is None:
        # Zero state placed like the incoming partial (which may be
        # mesh-replicated) so the chain never mixes device placements.
        d = mu_b.shape[0]
        sharding = getattr(mu_b, "sharding", None)
        place = (lambda x: jax.device_put(x, sharding)) if sharding else (lambda x: x)
        state = (
            place(jnp.zeros((d,), jnp.float32)),
            place(jnp.zeros((d, d), jnp.float32)),
            place(jnp.zeros((), jnp.float32)),
        )
    return _merge_jit(*state, mu_b, m2_or_cov_b, n_b, b_is_cov=b_is_cov)


_merge_jit = None


def calculate_embd_statistics_online(
    files: Sequence[PathLike],
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming dataset statistics over per-file embedding .npy files.

    Parity: reference fadtk/utils.py:19-46 (same accumulation order: files are
    folded sequentially into a float64 accumulator).
    """
    assert len(files) > 0, "No files provided"

    embd_dim = np.load(files[0], mmap_mode="r").shape[-1]
    mu = np.zeros(embd_dim)
    s = np.zeros((embd_dim, embd_dim))
    n = 0

    for f in files:
        mu_b, s_b, n_b = file_partial_stats(f)
        mu, s, n = merge_partial_stats(mu, s, n, mu_b, s_b, n_b)

    if n < 2:
        return mu, np.zeros_like(s)
    return mu, s / (n - 1)


def statistics_from_frame_iter(
    frames: Iterable[np.ndarray], dim: int
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming statistics over an iterator of (n_i, dim) frame arrays, without
    touching the filesystem. Same merge semantics as the online path."""
    mu = np.zeros(dim)
    s = np.zeros((dim, dim))
    n = 0
    for x in frames:
        if x.shape[0] == 0:
            continue
        n_b = x.shape[0]
        mu_b = np.mean(x, axis=0)
        s_b = np.cov(x, rowvar=False) * (n_b - 1) if n_b > 1 else np.zeros((dim, dim))
        mu, s, n = merge_partial_stats(mu, s, n, mu_b, s_b, n_b)
    if n < 2:
        return mu, np.zeros_like(s)
    return mu, s / (n - 1)


# --------------------------------------------------------------------------- #
# Device path: streaming masked Welford/Chan accumulator
# --------------------------------------------------------------------------- #


class WelfordState(NamedTuple):
    """Streaming second-moment state. ``cov = m2 / (n - 1)``."""

    mu: jax.Array  # (D,)   running mean
    m2: jax.Array  # (D, D) running centered second moment (sum of outer products)
    n: jax.Array  # ()     running frame count (float for jit-friendliness)


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        mu=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
        n=jnp.zeros((), dtype),
    )


def _batch_moments(x: jax.Array, mask: jax.Array | None, dtype) -> WelfordState:
    """One-shot moments of a (B, D) batch with optional (B,) validity mask.

    The second moment is computed mean-centered — ``(X-mu)^T (X-mu)`` — which is
    numerically stable and a single MXU matmul.
    """
    x = x.astype(dtype)
    if mask is None:
        n_b = jnp.asarray(x.shape[0], dtype)
        mu_b = jnp.mean(x, axis=0)
        xc = x - mu_b
    else:
        mask = mask.astype(dtype)
        n_b = jnp.sum(mask)
        # Guard against empty batches: normalize by max(n_b, 1).
        denom = jnp.maximum(n_b, 1.0)
        mu_b = jnp.sum(x * mask[:, None], axis=0) / denom
        xc = (x - mu_b) * mask[:, None]
    m2_b = jnp.dot(xc.T, xc, preferred_element_type=dtype)
    return WelfordState(mu=mu_b, m2=m2_b, n=n_b)


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Chan pairwise merge; jit/scan/psum friendly. Zero-count partials are
    handled exactly (delta term vanishes and mean is untouched)."""
    n = a.n + b.n
    denom = jnp.maximum(n, 1.0)
    delta = b.mu - a.mu
    mu = a.mu + delta * (b.n / denom)
    m2 = a.m2 + b.m2 + jnp.outer(delta, delta) * (a.n * b.n / denom)
    return WelfordState(mu=mu, m2=m2, n=n)


def welford_update(
    state: WelfordState, x: jax.Array, mask: jax.Array | None = None
) -> WelfordState:
    """Fold a (B, D) batch of frames into the running state."""
    return welford_merge(state, _batch_moments(x, mask, state.mu.dtype))


def welford_finalize(state: WelfordState) -> tuple[jax.Array, jax.Array]:
    """Return (mu, cov) with the unbiased n-1 normalization (reference
    fadtk/utils.py:45)."""
    denom = jnp.maximum(state.n - 1.0, 1.0)
    return state.mu, state.m2 / denom


def welford_merge_across(state: WelfordState, axis_name: str) -> WelfordState:
    """Merge per-device partials across a mesh axis with one psum each.

    Uses the generalized Chan identity (see module docstring): exact, and the
    D x D psum rides the ICI once regardless of device count.
    """
    n = jax.lax.psum(state.n, axis_name)
    denom = jnp.maximum(n, 1.0)
    mu = jax.lax.psum(state.mu * state.n, axis_name) / denom
    delta = state.mu - mu
    m2 = jax.lax.psum(
        state.m2 + jnp.outer(delta, delta) * state.n, axis_name
    )
    return WelfordState(mu=mu, m2=m2, n=n)
