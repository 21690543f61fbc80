"""Device mesh helpers.

The embedding sweep is data-parallel over clips (``dp``) and optionally
tensor-parallel over attention heads / FFN columns (``tp``) for the large
models. Statistics partials merge across ``dp`` with one psum (D x D rides the
ICI once; see fadtk_tpu.metric.stats.welford_merge_across).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices.

    ``tp`` defaults to 1 (pure data parallelism) — the embedding models are
    small enough that DP is usually optimal; TP exists for the large variants
    and for latency-bound scoring.
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    tp = tp or 1
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    dp = n // tp
    return Mesh(np.array(devices).reshape(dp, tp), ("dp", "tp"))
