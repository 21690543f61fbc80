"""Generic data-parallel chunk pipeline: any fixed-window ("chunked") model
family sharded over the ``dp`` mesh axis.

The speech family has a specialized (dp, tp) path (parallel/tp.py). Every
other family — VGGish, CLAP (laion + msclap), CDPAM, DAC, EnCodec-48k,
Whisper — reduces to the same shape: a host ``make_chunks`` producing
fixed-shape windows, and a pure device ``forward`` mapping a window batch to
embedding frames. That uniformity is what this module exploits:

- chunks from many files stream into fixed-size device batches whose leading
  axis is sharded over ``dp`` (jit + NamedSharding; the SPMD partitioner
  inserts the cross-chip psum for the reductions — no hand-written
  collectives);
- each batch folds into (mu, M2, n) Gaussian partials ON DEVICE, so only a
  (d, d) triple crosses back per batch, never the frames;
- padded batch rows carry weight 0 and drop out of the statistics exactly.

Frames round-trip through float16 before accumulating, matching the cached
.npy path's storage dtype (reference fadtk/model_loader.py:47-48) — tested
equal to the host pipeline within float32 accumulation noise.

Ragged tails that cannot share the static window shape (EnCodec-48k's final
partial segment must run at its exact length — zero-padding would change the
reflect-conv values, reference fadtk/model_loader.py:139-152) are computed by
the family's ``tail`` callback outside the sharded path and Chan-merged on
host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..metric.stats import merge_partial_stats_device


def _finalize_device_state(state, d: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Fetch the device (mu, M2, n) chain once and finalize to (mu, cov, n)."""
    if state is None:
        return np.zeros(d), np.zeros((d, d)), 0
    mu = np.asarray(state[0], np.float64)
    s = np.asarray(state[1], np.float64)
    n = int(np.asarray(state[2]))
    if n < 2:
        return mu, np.zeros((d, d)), n
    return mu, s / (n - 1), n


@dataclass
class DpChunkSpec:
    """How a model family plugs into the generic dp pipeline.

    forward: (params, *chunk_arrays) -> frames (B, F, d) or (B, d); pure,
        jit-safe, static shapes.
    make_chunks: clip -> tuple of np arrays whose leading dim is n_chunks
        (e.g. (windows,) or (chunks, valid_lengths)).
    params: the model's parameter pytree.
    num_features: d.
    tail: optional clip -> (m, d) float32 frames computed exactly outside the
        static-window path (or None when every chunk is static).
    """

    forward: Callable
    make_chunks: Callable[[np.ndarray], tuple]
    params: object
    num_features: int
    tail: Optional[Callable[[np.ndarray], Optional[np.ndarray]]] = None
    # Per-device chunk batch that fills the MXU for this family (bench-tuned:
    # small windows need deep batches — vggish 7%->52% MFU going 64->256).
    preferred_batch: int = 16


def make_dp_chunk_stats_step(mesh, spec: DpChunkSpec):
    """Jitted (params, weights, *chunks) -> (mu, M2, n) with chunks sharded
    over dp and outputs replicated.

    Memoized on the spec object per mesh: a fresh jit per dataset pass would
    re-trace and re-compile the family forward every call (the executable
    identity, not just the HLO, keys jax's in-memory cache). Families cache
    their spec per model instance (runner/device_pipeline._model_dp_specs),
    so repeated scoring runs in one process reuse one executable.
    """
    cache = spec.__dict__.setdefault("_step_cache", {})
    if mesh in cache:
        return cache[mesh]
    data = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(rep, rep, rep))
    def step(params, weights, *chunks):
        frames = spec.forward(params, *chunks)
        if frames.ndim == 2:
            frames = frames[:, None, :]
        b, f, d = frames.shape
        flat = frames.reshape(b * f, d)
        # float16 storage parity with the cached-embedding path.
        flat = flat.astype(jnp.float16).astype(jnp.float32)
        w = jnp.repeat(weights.astype(jnp.float32), f)
        n = w.sum()
        mu = (flat * w[:, None]).sum(0) / jnp.maximum(n, 1.0)
        centered = flat - mu
        m2 = (centered * w[:, None]).T @ centered
        return mu, m2, n

    params_rep = jax.device_put(spec.params, rep)
    # int16 fast transport latch, shared across meshes (per family/spec):
    # chunked-family audio is usually 16-bit-PCM exact (CLAP even quantizes
    # through int16 by reference semantics) and ships at half the bytes;
    # normalized windows / mel examples (DAC, vggish) fail the exactness
    # check once and latch the probe off (parallel/transfer.py).
    latch = spec.__dict__.setdefault("_int16_latch", [True])

    def run(weights: np.ndarray, *chunks: np.ndarray):
        """Returns the (mu, M2, n) partial as DEVICE arrays — callers chain
        them with merge_partial_stats_device so dispatches stay async."""
        from .transfer import ship_dp_sharded

        w = jax.device_put(jnp.asarray(weights), data)
        arrs = []
        for c in chunks:
            c = np.asarray(c)
            arr, ok = ship_dp_sharded(mesh, c, latch[0])
            if not ok and latch[0] and c.dtype == np.float32:
                latch[0] = False
            arrs.append(arr)
        return step(params_rep, w, *arrs)

    cache[mesh] = run
    return run


@dataclass
class DpWholeClipSpec:
    """dp pipeline plug for families with no static window: whole clips run at
    their EXACT length (padding the time axis would change e.g. reflect-pad
    conv values — encodec-emb 24k, reference fadtk/model_loader.py:135-137).

    Sharding unit = the clip. Clips of identical prepared shape stack into one
    batch whose leading axis shards over ``dp``; each distinct length compiles
    its own executable (uniform-length datasets — the common case — compile
    once). Row padding (all-zero clips with weight 0) makes every dispatch
    divisible by dp without perturbing real rows: the forward is per-sample
    independent, so dead rows drop out of the statistics exactly.

    forward: (params, clips (B, *shape)) -> frames (B, F, d) or (B, d).
    prepare: host clip -> the exact-shape array the forward consumes.
    """

    forward: Callable
    prepare: Callable[[np.ndarray], np.ndarray]
    params: object
    num_features: int
    preferred_batch: int = 16


def dp_whole_clip_dataset_stats(
    spec: DpWholeClipSpec,
    clips_iter,
    mesh,
    batch: int | None = None,
    ckpt=None,
    files_done: int = 0,
    initial_state=None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mu, cov, n_frames) over host clips for a whole-clip (no-static-window)
    family, sharded over the ``dp`` mesh axis.

    Clips group by exact prepared shape; full groups dispatch as they fill,
    stragglers flush at the end padded (rows only) to a multiple of dp.

    Host RAM stays O(window): a ragged dataset (every clip a distinct length)
    cannot pile up unboundedly — whenever total buffered clips exceed a cap
    (4x batch), the largest group flushes early (partial dispatches are exact,
    only slightly less efficient). Many distinct shapes also log a hint, since
    each distinct length compiles its own executable.

    ``ckpt``/``files_done``/``initial_state``: crash-resume plumbing
    (runner/resume.py) — at the checkpoint cadence every buffered group is
    dispatched (exact: row padding carries weight 0) so the saved state covers
    the consumed clips exactly.
    """
    from collections import defaultdict

    from ..utils import log

    dp = mesh.shape["dp"]
    if batch is None:
        batch = spec.preferred_batch * dp
    batch = max(dp, (batch // dp) * dp)
    step = make_dp_chunk_stats_step(mesh, spec)

    d = spec.num_features
    state = initial_state  # device-resident (mu, M2, n) chain — dispatches stay async

    groups: dict[tuple, list[np.ndarray]] = defaultdict(list)
    n_buffered = 0
    max_buffered = 4 * batch
    warned_shapes = False

    def dispatch(rows: list[np.ndarray]):
        nonlocal state
        taken = len(rows)
        pad = (-taken) % dp
        weights = np.ones((taken,), np.float32)
        if pad:
            rows = rows + [np.zeros_like(rows[0])] * pad
            weights = np.concatenate([weights, np.zeros((pad,), np.float32)])
        mu_b, m2_b, n_b = step(weights, np.stack(rows))
        state = merge_partial_stats_device(state, mu_b, m2_b, n_b)

    for clip in clips_iter:
        c = spec.prepare(np.asarray(clip))
        bucket = groups[c.shape]
        bucket.append(c)
        n_buffered += 1
        if len(bucket) >= batch:
            dispatch(bucket[:batch])
            del bucket[:batch]
            n_buffered -= batch
        if n_buffered > max_buffered:
            if not warned_shapes and len(groups) > max_buffered // 2:
                warned_shapes = True
                log.info(
                    f"whole-clip dp: {len(groups)} distinct clip shapes buffered — "
                    "a ragged-length dataset compiles one executable per length; "
                    "flushing early to bound host RAM"
                )
            shape = max(groups, key=lambda k: len(groups[k]))
            flushed = groups.pop(shape)
            dispatch(flushed)
            n_buffered -= len(flushed)
        files_done += 1
        if ckpt is not None and ckpt.due(files_done):
            for shape in list(groups):
                rows = groups.pop(shape)
                if rows:
                    dispatch(rows)
            n_buffered = 0
            if state is not None:
                ckpt.save(tuple(np.asarray(x) for x in state), files_done)
    for bucket in groups.values():
        if bucket:
            dispatch(bucket)

    return _finalize_device_state(state, d)


def dp_chunk_dataset_stats(
    spec: DpChunkSpec,
    clips_iter,
    mesh,
    batch: int | None = None,
    ckpt=None,
    files_done: int = 0,
    initial_state=None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mu, cov, n_frames) over an iterator of host clips.

    Chunks from consecutive clips pack into full device batches (one
    executable for the whole dataset); the final partial batch pads with
    weight-0 rows. Batch partials merge with the exact Chan update on host.
    ``batch=None`` uses the family's MXU-filling default, scaled up to the
    mesh (``preferred_batch`` per device).

    ``ckpt``/``files_done``/``initial_state``: crash-resume plumbing
    (runner/resume.py) — at the checkpoint cadence pending chunks force-flush
    (exact: padded rows carry weight 0) so the saved state covers the consumed
    clips exactly.
    """
    dp = mesh.shape["dp"]
    if batch is None:
        batch = spec.preferred_batch * dp
    assert batch % dp == 0, f"batch {batch} must divide dp={dp}"
    step = make_dp_chunk_stats_step(mesh, spec)
    rep = NamedSharding(mesh, P())

    d = spec.num_features
    state = initial_state  # device-resident (mu, M2, n) chain — dispatches stay async

    pending: list[tuple] = []  # per-chunk tuples of arrays
    n_pending = 0

    def flush(force: bool):
        nonlocal pending, n_pending, state
        while n_pending >= batch or (force and n_pending):
            take, taken = [], 0
            while taken < batch and pending:
                group = pending[0]
                room = batch - taken
                if group[0].shape[0] <= room:
                    take.append(group)
                    taken += group[0].shape[0]
                    pending.pop(0)
                else:
                    take.append(tuple(a[:room] for a in group))
                    pending[0] = tuple(a[room:] for a in group)
                    taken += room
            n_pending -= taken
            parts = [np.concatenate([g[i] for g in take]) for i in range(len(take[0]))]
            weights = np.ones((taken,), np.float32)
            if taken < batch:
                pad = batch - taken
                parts = [
                    np.concatenate([p, np.zeros((pad, *p.shape[1:]), p.dtype)])
                    for p in parts
                ]
                weights = np.concatenate([weights, np.zeros((pad,), np.float32)])
            mu_b, m2_b, n_b = step(weights, *parts)
            state = merge_partial_stats_device(state, mu_b, m2_b, n_b)

    for clip in clips_iter:
        clip = np.asarray(clip)
        group = spec.make_chunks(clip)
        if group[0].shape[0]:
            pending.append(group)
            n_pending += group[0].shape[0]
        if spec.tail is not None:
            frames = spec.tail(clip)
            if frames is not None and frames.shape[0]:
                f = frames.astype(np.float16).astype(np.float32)
                mu_t = f.mean(0, dtype=np.float32)
                m2_t = (f - mu_t).T @ (f - mu_t)
                # Placed mesh-replicated like the step outputs so the merge
                # chain never mixes device placements.
                state = merge_partial_stats_device(
                    state,
                    jax.device_put(jnp.asarray(mu_t), rep),
                    jax.device_put(jnp.asarray(m2_t), rep),
                    jax.device_put(jnp.asarray(np.float32(f.shape[0])), rep),
                )
        flush(force=False)
        files_done += 1
        if ckpt is not None and ckpt.due(files_done):
            flush(force=True)
            if state is not None:
                ckpt.save(tuple(np.asarray(x) for x in state), files_done)
    flush(force=True)

    return _finalize_device_state(state, d)
