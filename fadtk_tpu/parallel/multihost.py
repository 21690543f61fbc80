"""Multi-host initialization helpers.

On a multi-host TPU pod (e.g. v5e-256), each host process calls
``initialize()`` once before any jax usage; the mesh helpers then span all
global devices, with the `dp` axis laid out so per-batch psum merges ride ICI
within a slice and only the final (D, D) statistics cross DCN (one array per
dataset, independent of scale — metric/stats.welford_merge_across).

The reference has no distributed backend at all (SURVEY.md 2.5: a spawn
process pool per host); this module is the jax.distributed equivalent of
"scale out the embedding sweep".
"""

from __future__ import annotations

import os

import jax

from ..utils import log


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-based autodetection on TPU pods.

    On Cloud TPU the arguments are discovered from the metadata environment.
    Elsewhere pass them explicitly, or export JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (jax itself only reads the first; the
    other two fill the gap for launchers without cluster autodetection, and
    let `fadtk ... --multihost` run without per-site wrapper scripts).
    """
    if num_processes is None and (v := os.environ.get("JAX_NUM_PROCESSES")):
        num_processes = int(v)
    if process_id is None and (v := os.environ.get("JAX_PROCESS_ID")):
        process_id = int(v)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def global_mesh(tp: int = 1):
    """(dp, tp) mesh over all global devices; tp stays within a host's local
    devices so row/column-parallel psums never cross DCN."""
    from .mesh import make_mesh

    assert jax.local_device_count() % tp == 0, (
        f"tp={tp} must divide local device count {jax.local_device_count()} "
        "so tensor-parallel collectives stay on ICI"
    )
    return make_mesh(jax.device_count(), tp=tp)
