"""Host->device batch transport for the sharded pipelines: ship
16-bit-PCM-exact float batches as int16 — HALF the bytes over the link —
and rescale to float32 on device in a separate tiny jit.

Why: pipeline audio is almost always 16-bit PCM scaled by 1/32768 (the
convert-cache contract, reference fadtk/model_loader.py:63-70; the device
pipeline's in-memory converts quantize through int16 the same way), so the
float32 batches the steps consume are exactly int16-representable. On the
tunneled bench host the link moves ~45-85 MB/s and the client retains RAM
proportional to bytes shipped (CLAUDE.md), so transfer bytes are a real
term in the e2e pipeline wall time.

Why a SEPARATE rescale jit (same scheme as models/base._ship_int16_if_exact
and the speech host path): int16->f32 and the multiply by 2^-15 are exact,
but folding the convert into a family forward changes XLA's fusion and was
measured drifting a few f16 ulps — keeping it out means the forward
executable (and its results) are byte-for-byte the ones the f32 path uses.
The rescale output is committed with the dp data sharding, so the step's
shard_map/jit consumes it without a re-transfer.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

#: mesh -> jitted int16->f32 rescale emitting dp-sharded output.
_RESCALE_CACHE: dict = {}

_FALSY = {"0", "false", "no", "off", ""}


def _enabled() -> bool:
    """FADTK_TPU_INT16_TRANSPORT=0 forces plain f32 transfers (A/B knob —
    scripts/int16_transport_probe.py times both in one process; also the
    rescue hatch if a backend ever mishandles the int16 path)."""
    return os.environ.get("FADTK_TPU_INT16_TRANSPORT", "1").lower() not in _FALSY


def ship_dp_sharded(mesh, x: np.ndarray, try_int16: bool = True):
    """device_put ``x`` sharded over the ``dp`` mesh axis (leading dim).

    Returns ``(device_array, was_int16)``. When ``try_int16`` and ``x`` is a
    float32 array whose values are exactly 16-bit PCM (x * 32768 integral and
    in int16 range), the transfer ships int16 and rescales on device —
    bit-identical float32, half the bytes. Otherwise a plain device_put.
    Callers latch ``was_int16`` off after the first non-exact batch so
    homogeneous non-PCM datasets (e.g. normalized DAC windows, mel examples)
    pay the host-side exactness check once, not per dispatch.
    """
    data = NamedSharding(mesh, P("dp"))
    if try_int16 and x.dtype == np.float32 and x.size and _enabled():
        scaled = x * 32768.0
        if (
            scaled.min(initial=0.0) >= -32768.0  # int16 holds -32768
            and scaled.max(initial=0.0) <= 32767.0
            and np.array_equal(scaled, np.rint(scaled))
        ):
            fn = _RESCALE_CACHE.get(mesh)
            if fn is None:
                fn = jax.jit(
                    lambda a: a.astype(jnp.float32) * (1.0 / 32768.0),
                    out_shardings=data,
                )
                _RESCALE_CACHE[mesh] = fn
            return fn(jax.device_put(scaled.astype(np.int16), data)), True
    return jax.device_put(jnp.asarray(x), data), False
