"""Device-resident dataset scoring: audio -> sharded embedding -> streaming
covariance, without materializing per-file embedding .npy files.

This is the TPU-native fast path for "score two directories" (the reference
always round-trips embeddings through the filesystem, fad.py:188-209): clips
are decoded on host threads, convert-cache misses are Kaiser-resampled and
PCM-quantized ON DEVICE in batches (runner/convert.py — the host convert tax
drops to decode + IO), then clips are bucketed and batched, embedded on the
mesh, and folded into per-device Welford partials merged with one psum. Only
(mu, M2, n) per batch returns to host, where batches merge with the exact
Chan update.

Two device paths cover the zoo:

- speech family (w2v2/hubert/wavlm/MERT): specialized (dp, tp) bucketed step
  with tensor-parallel attention/FFN (parallel/tp.py);
- every chunked family (VGGish, CLAP laion+ms, CDPAM, DAC, EnCodec-48k,
  Whisper): the generic dp-sharded chunk pipeline (parallel/dp.py) via each
  model's ``dp_spec()``; encodec-emb (24k) has no static window — whole clips
  shard over dp at exact length via ``dp_whole_spec()`` (equal-length groups,
  one executable per distinct length).

Statistics equal the cached-embedding path to float32 accumulation accuracy
(the cached path stores float16 frames; this path applies the same float16
round-trip before accumulating — tested).
"""

from __future__ import annotations

from itertools import islice
from pathlib import Path
from typing import Sequence

import numpy as np

from ..metric.stats import merge_partial_stats_device
from ..models.base import EmbeddingModel
from ..models.speech.family import BUCKET_SECONDS, SpeechEmbeddingModel
from ..parallel.tp import make_sharded_eval_step
from ..parallel.transfer import ship_dp_sharded
from ..utils import PathLike, dataset_files, next_multiple
from .convert import ClipLoader
from .fad import FrechetAudioDistance
from .resume import open_checkpoint, pipeline_ckpt_path


def _place_state(mesh, host_state):
    """Put a host (mu, M2, n) resume triple on the mesh, replicated — the
    same placement the step outputs use, so the merge chain stays uniform."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return tuple(jax.device_put(jnp.asarray(x), rep) for x in host_state)


def dataset_stats_device(
    model: EmbeddingModel,
    files: Sequence[Path] | PathLike,
    mesh=None,
    batch: int | None = None,
    workers: int = 8,
    checkpoint: PathLike | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mu, cov, n_frames) of a dataset, computed on device.

    ``mesh``: a (dp, tp) Mesh for multi-chip runs; None = dp over ALL local
    devices (tp=1) — the CLI's `--device-pipeline` default.

    The speech family takes the specialized (dp, tp) bucketed path below;
    every other family goes through its ``dp_spec`` (fixed-window chunks) or
    ``dp_whole_spec`` (whole clips at exact length, encodec-emb 24k) and the
    generic sharded pipelines in parallel/dp.py.

    ``checkpoint``: path for crash-resume snapshots of the running (mu, M2, n)
    + file cursor (runner/resume.py). When ``files`` is a dataset directory,
    it defaults to ``{dir}/stats/{model}/pipeline_ckpt.npz``; pass a path to
    override, or leave None (explicit file list) / set FADTK_TPU_CKPT=0 to
    disable. Speech-path resume with the same ``batch`` is bit-identical to
    an uninterrupted run; the chunked paths resume f32-accumulation-identical.
    """
    from ..parallel.mesh import make_mesh

    if isinstance(files, (str, Path)):
        if checkpoint is None and Path(files).is_dir():
            checkpoint = pipeline_ckpt_path(files, model)
        files = dataset_files(files)
    model.ensure_loaded()
    if mesh is None:
        mesh = make_mesh()

    if not isinstance(model, SpeechEmbeddingModel):
        return _dataset_stats_device_chunked(
            model, files, mesh, batch=batch, workers=workers, checkpoint=checkpoint
        )

    dp = mesh.shape["dp"]
    if batch is None:
        batch = 16 * max(1, dp)
    assert batch % dp == 0, f"batch {batch} must divide dp={dp}"

    step = make_sharded_eval_step(model.cfg, model.params, mesh, model.layer)
    # Commit the params to the mesh ONCE (their tp/replicated shardings are
    # the step's in_specs): uncommitted params would be re-sharded onto the
    # mesh every batch — free on the 1-chip bench, a full-model re-transfer
    # per batch on a real (dp, tp) mesh.
    import jax
    from jax.sharding import NamedSharding

    from ..parallel.tp import speech_param_specs

    params_dev = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        model.params,
        speech_param_specs(model.cfg, model.params),
    )

    # Host decode on threads; resample/quantize for cache misses runs on
    # device in batches (runner/convert.py), so the host convert tax is
    # decode + IO only.
    loader = ClipLoader(model, workers=workers)

    # Crash-resume (runner/resume.py): snapshots happen only at batch
    # boundaries, which here ARE file boundaries (one clip = one row), so a
    # resumed run with the same ``batch`` re-batches identically and the final
    # stats are bit-identical to an uninterrupted run.
    ckpt, host_state, files_done = open_checkpoint(checkpoint, model, files)

    # The running (mu, M2, n) stays ON DEVICE (merge_partial_stats_device):
    # the loop never fetches per-batch partials, so every step/merge dispatch
    # queues asynchronously and the next window's host decode overlaps device
    # compute. One fetch at the end syncs the chain.
    state = None if host_state is None else _place_state(mesh, host_state)
    clips_iter = loader.iter_clips(files[files_done:])
    # Audio from the loader is 16-bit-PCM provenance (cache-hit wavs and the
    # in-memory converts alike), so batches ship as int16 — half the link
    # bytes — and rescale on device (parallel/transfer.py; latch cleared on
    # the first batch that is not exactly int16).
    try_int16 = True
    while True:
        clips = [
            c if c.shape[0] <= model.limit else c[: model.limit]
            for c in islice(clips_iter, batch)
        ]
        if not clips:
            break
        bucket = next_multiple(max(c.shape[0] for c in clips), BUCKET_SECONDS * model.sr)
        audio = np.zeros((batch, bucket), np.float32)
        num_valid = np.ones((batch,), np.int32)
        for j, c in enumerate(clips):
            audio[j, : c.shape[0]] = c
            num_valid[j] = c.shape[0]
        audio_dev, try_int16 = ship_dp_sharded(mesh, audio, try_int16)
        mu_b, cov_b, n_b = step(params_dev, audio_dev, num_valid)
        # Empty/padded batches fold in exactly: n_b=0 contributes nothing
        # (welford_finalize's guarded denom keeps cov_b finite).
        state = merge_partial_stats_device(state, mu_b, cov_b, n_b, b_is_cov=True)
        files_done += len(clips)
        if ckpt is not None and ckpt.due(files_done):
            # One host fetch syncs the chain up to here; the queue refills on
            # the next batch. State covers files[:files_done] exactly.
            ckpt.save(tuple(np.asarray(x) for x in state), files_done)

    if ckpt is not None:
        ckpt.finalize()
    if state is None:
        d = model.num_features
        return np.zeros(d), np.zeros((d, d)), 0
    mu = np.asarray(state[0], np.float64)
    s = np.asarray(state[1], np.float64)
    n = int(np.asarray(state[2]))
    if n < 2:
        return mu, np.zeros_like(s), n
    return mu, s / (n - 1), n


def _model_dp_specs(model: EmbeddingModel):
    """(dp_spec, dp_whole_spec) memoized on the model instance.

    Families build a fresh spec (new forward closure + DpChunkSpec) per
    ``dp_spec()`` call; since the dp step executables are memoized ON the
    spec (parallel/dp.py), the spec itself must be reused across dataset
    passes or every pass re-traces and re-compiles the family forward.
    Safe to latch: ``ensure_loaded`` is idempotent and the bf16 latch
    (models/base.py) pins a model instance's params/dtype for its lifetime.
    """
    cached = getattr(model, "_dp_specs_cache", None)
    if cached is None:
        spec = model.dp_spec()
        whole = model.dp_whole_spec() if spec is None else None
        cached = (spec, whole)
        model._dp_specs_cache = cached
    return cached


def _dataset_stats_device_chunked(
    model: EmbeddingModel,
    files: Sequence[Path],
    mesh,
    batch: int | None = None,
    workers: int = 8,
    checkpoint: PathLike | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Generic dp-sharded chunk pipeline for the non-speech families."""
    from ..parallel.dp import dp_chunk_dataset_stats, dp_whole_clip_dataset_stats

    spec, whole = _model_dp_specs(model)
    if spec is None and whole is None:
        raise NotImplementedError(
            f"{model.name} has neither a static-window nor a whole-clip dp "
            "path; use the host cached-embedding path."
        )

    # Crash-resume: saves happen after a force-flush of pending chunks, so
    # the snapshot covers files[:cursor] exactly; resumed stats equal an
    # uninterrupted run to f32 accumulation (batch packing differs).
    ckpt, host_state, files_done = open_checkpoint(checkpoint, model, files)
    initial = None if host_state is None else _place_state(mesh, host_state)

    # ClipLoader windows internally (O(window) host RAM): decode threads
    # overlap device compute, and convert-cache misses resample on device.
    clips = ClipLoader(model, workers=workers).iter_clips(files[files_done:])

    if spec is not None:
        out = dp_chunk_dataset_stats(
            spec, clips, mesh, batch=batch,
            ckpt=ckpt, files_done=files_done, initial_state=initial,
        )
    else:
        out = dp_whole_clip_dataset_stats(
            whole, clips, mesh, batch=batch,
            ckpt=ckpt, files_done=files_done, initial_state=initial,
        )
    if ckpt is not None:
        ckpt.finalize()
    return out


def score_datasets_device(
    model: EmbeddingModel,
    baseline: PathLike,
    eval_dir: PathLike,
    mesh=None,
    batch: int | None = None,
) -> float:
    """FAD between two datasets with both Gaussians computed on device; the
    baseline may also be a stats source (npz/name) resolved the usual way."""
    from ..metric.frechet import frechet_distance

    fad = FrechetAudioDistance(model, load_model=True)
    if Path(str(baseline)).is_dir():
        mu1, cov1, _ = dataset_stats_device(model, baseline, mesh=mesh, batch=batch)
    else:
        mu1, cov1 = fad.load_stats(baseline)
    mu2, cov2, _ = dataset_stats_device(model, eval_dir, mesh=mesh, batch=batch)
    return frechet_distance(mu1, cov1, mu2, cov2)
