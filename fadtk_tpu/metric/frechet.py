"""Frechet distance between two Gaussians.

    d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrtm(C1 C2))

Three interchangeable evaluators for the hard term ``Tr sqrtm(C1 C2)``:

- ``eigh`` (default, host float64): the symmetric reformulation
  ``Tr sqrtm(C1 C2) = Tr sqrtm(S1 C2 S1)`` with ``S1 = sqrtm(C1)`` via eigh.
  For (P)SD covariances this equals the reference's general-eigendecomposition
  value (reference fadtk/fad.py:91-92) up to float64 rounding, is deterministic,
  and needs only symmetric eigensolvers (TPU XLA has no non-symmetric ``eig``).

- ``reference`` (host float64): bit-faithful replication of the reference's dual
  computation — scipy ``sqrtm`` cross-check plus general ``eig`` value, the eps
  jitter fallback, the imaginary-component checks and the trace-discrepancy
  warning (reference fadtk/fad.py:51-120). Used for differential validation.

- ``newton_schulz`` (device float32): a jit-compiled Newton-Schulz iteration —
  pure MXU matmuls — for on-TPU scoring loops (FAD-inf, per-song sweeps) where
  thousands of sqrtm evaluations amortize and the tolerance is statistical.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("fadtk_tpu")


# --------------------------------------------------------------------------- #
# Host float64 paths
# --------------------------------------------------------------------------- #


def _trace_sqrtm_product_eigh(cov1: np.ndarray, cov2: np.ndarray) -> float:
    """Tr sqrtm(C1 C2) via the symmetric form, float64, eigh only.

    C1 = U diag(a) U^T  =>  S1 = U diag(sqrt(max(a,0))) U^T
    M  = S1 C2 S1 is symmetric PSD and similar to sqrt-able C1 C2, so
    Tr sqrtm(C1 C2) = sum sqrt(eigvalsh(M)) with eigenvalues clipped at 0.
    """
    from scipy import linalg

    a, u = linalg.eigh(cov1.astype(np.float64))
    s1 = (u * np.sqrt(np.clip(a, 0.0, None))) @ u.T
    m = s1 @ cov2.astype(np.float64) @ s1
    m = (m + m.T) * 0.5
    ev = linalg.eigvalsh(m)
    return float(np.sum(np.sqrt(np.clip(ev, 0.0, None))))


def _trace_sqrtm_product_reference(
    cov1: np.ndarray, cov2: np.ndarray, eps: float = 1e-6
) -> float:
    """The reference's computation of Tr sqrtm(C1 C2), warnings and all.

    Behavior parity: reference fadtk/fad.py:86-117 — the returned trace comes
    from the general (non-symmetric) eigendecomposition; scipy's sqrtm runs as a
    cross-check and a >1e-3 trace disagreement only logs a warning.
    """
    from numpy.lib.scimath import sqrt as scisqrt
    from scipy import linalg

    prod = cov1.dot(cov2)
    # scipy >= 1.16 deprecates disp= (removed in 1.18); the bare call returns
    # the array directly, matching the reference's sqrtm(..., disp=False)[0].
    covmean_sqrtm = linalg.sqrtm(prod)

    d, v = linalg.eig(prod)
    covmean = (v * scisqrt(d)) @ linalg.inv(v)

    if not np.isfinite(covmean).all():
        log.info(
            "fid calculation produces singular product; "
            f"adding {eps} to diagonal of cov estimates"
        )
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset).dot(cov2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    tr_covmean = np.trace(covmean)
    tr_sqrtm = np.trace(covmean_sqrtm)
    if np.iscomplexobj(tr_sqrtm) and np.abs(tr_sqrtm.imag) < 1e-3:
        tr_sqrtm = tr_sqrtm.real
    if not np.iscomplexobj(tr_sqrtm):
        delt = np.abs(tr_covmean - tr_sqrtm)
        if delt > 1e-3:
            log.warning(f"Detected high error in sqrtm calculation: {delt}")

    return float(tr_covmean)


# --------------------------------------------------------------------------- #
# Device path: Newton-Schulz sqrtm trace (pure matmuls, MXU-friendly)
# --------------------------------------------------------------------------- #


def _ns_sqrt_sym(m: jax.Array, iters: int) -> jax.Array:
    """Newton-Schulz square root of a symmetric PSD matrix.

    Scaled so that ||M/c - I|| < 1 guarantees convergence; returns sqrt(M).
    The loop body is two DxD matmuls — ideal MXU work, unrolled by lax.scan.
    """
    dim = m.shape[-1]
    eye = jnp.eye(dim, dtype=m.dtype)
    norm = jnp.sqrt(jnp.sum(m * m))
    norm = jnp.maximum(norm, jnp.asarray(1e-30, m.dtype))
    y0 = m / norm
    z0 = eye

    def body(carry, _):
        y, z = carry
        t = 0.5 * (3.0 * eye - jnp.dot(z, y, preferred_element_type=m.dtype))
        y = jnp.dot(y, t, preferred_element_type=m.dtype)
        z = jnp.dot(t, z, preferred_element_type=m.dtype)
        return (y, z), None

    (y, _), _ = jax.lax.scan(body, (y0, z0), None, length=iters)
    return y * jnp.sqrt(norm)


@partial(jax.jit, static_argnames=("iters",))
def trace_sqrtm_product_ns(
    cov1: jax.Array, cov2: jax.Array, iters: int = 30
) -> jax.Array:
    """Tr sqrtm(C1 C2) on device via two Newton-Schulz square roots.

    Symmetric form: S1 = sqrt(C1); Tr sqrtm(C1 C2) = Tr sqrt(S1 C2 S1).
    """
    dtype = cov1.dtype
    s1 = _ns_sqrt_sym((cov1 + cov1.T) * 0.5, iters)
    m = s1 @ cov2.astype(dtype) @ s1
    m = (m + m.T) * 0.5
    s = _ns_sqrt_sym(m, iters)
    return jnp.trace(s)


@partial(jax.jit, static_argnames=("iters",))
def frechet_distance_device(
    mu1: jax.Array, cov1: jax.Array, mu2: jax.Array, cov2: jax.Array, iters: int = 30
) -> jax.Array:
    """Full Frechet distance on device (float32 Newton-Schulz sqrtm)."""
    diff = mu1 - mu2
    tr = trace_sqrtm_product_ns(cov1, cov2, iters=iters)
    return jnp.dot(diff, diff) + jnp.trace(cov1) + jnp.trace(cov2) - 2.0 * tr


# --------------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------------- #


def frechet_distance(mu1, cov1, mu2, cov2, *, method: str = "eigh", eps: float = 1e-6):
    """Frechet distance between N(mu1, C1) and N(mu2, C2).

    ``method``: 'eigh' (host f64, default), 'reference' (host f64, bit-faithful
    replication of fadtk), or 'newton_schulz' (device f32).
    Input validation parity: reference fadtk/fad.py:72-81.
    """
    mu1 = np.atleast_1d(np.asarray(mu1))
    mu2 = np.atleast_1d(np.asarray(mu2))
    cov1 = np.atleast_2d(np.asarray(cov1))
    cov2 = np.atleast_2d(np.asarray(cov2))

    assert mu1.shape == mu2.shape, (
        f"Training and test mean vectors have different lengths ({mu1.shape} vs {mu2.shape})"
    )
    assert cov1.shape == cov2.shape, (
        f"Training and test covariances have different dimensions ({cov1.shape} vs {cov2.shape})"
    )

    # The reference subtracts means at their stored precision (eval means can be
    # float16, fadtk/fad.py:48,83); numpy's promotion reproduces that here.
    diff = mu1.astype(np.float64) - mu2.astype(np.float64)

    if method == "reference":
        tr = _trace_sqrtm_product_reference(
            cov1.astype(np.float64), cov2.astype(np.float64), eps=eps
        )
    elif method == "eigh":
        tr = _trace_sqrtm_product_eigh(cov1, cov2)
    elif method == "newton_schulz":
        tr = float(
            trace_sqrtm_product_ns(
                jnp.asarray(cov1, jnp.float32), jnp.asarray(cov2, jnp.float32)
            )
        )
    else:
        raise ValueError(f"Unknown frechet method: {method}")

    return float(
        diff.dot(diff)
        + np.trace(cov1.astype(np.float64))
        + np.trace(cov2.astype(np.float64))
        - 2.0 * tr
    )


class FrechetBaseline:
    """Precomputed baseline factorization for bulk scoring.

    ``Tr sqrtm(C1 C2) = Tr sqrtm(S1 C2 S1)`` needs ``S1 = sqrtm(C1)`` only
    once per baseline — the FAD-inf sweep (25 evaluations) and per-song scoring
    (one per file) reuse it, halving the host eigendecompositions versus
    calling :func:`frechet_distance` per pair (the reference refactors nothing
    and pays the full sqrtm each time, fadtk/fad.py:331-340, 376-378).
    """

    def __init__(self, mu1, cov1):
        from scipy import linalg

        self.mu1 = np.atleast_1d(np.asarray(mu1)).astype(np.float64)
        cov1 = np.atleast_2d(np.asarray(cov1)).astype(np.float64)
        self.tr1 = float(np.trace(cov1))
        a, u = linalg.eigh(cov1)
        self.s1 = (u * np.sqrt(np.clip(a, 0.0, None))) @ u.T

    def distance(self, mu2, cov2) -> float:
        from scipy import linalg

        mu2 = np.atleast_1d(np.asarray(mu2)).astype(np.float64)
        cov2 = np.atleast_2d(np.asarray(cov2)).astype(np.float64)
        m = self.s1 @ cov2 @ self.s1
        ev = linalg.eigvalsh((m + m.T) * 0.5)
        tr_sqrt = float(np.sum(np.sqrt(np.clip(ev, 0.0, None))))
        diff = self.mu1 - mu2
        return float(diff.dot(diff) + self.tr1 + np.trace(cov2) - 2.0 * tr_sqrt)


def calc_frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6):
    """Reference-named alias (fadtk/fad.py:51). Uses the default 'eigh' method,
    which agrees with the reference's value to float64 rounding for (P)SD
    covariances."""
    return frechet_distance(mu1, cov1, mu2, cov2, method="eigh", eps=eps)
