"""Crash-resume for the streaming device pipeline (runner/resume.py).

The cached path resumes per file via skip-if-cached (reference
fadtk/fad.py:188-195); ``--device-pipeline`` skips those caches, so it
periodically checkpoints its (mu, M2, n) partials + file cursor. Pinned here:

- speech-path resume is BIT-identical to an uninterrupted run (checkpoints
  land on batch == file boundaries and the f32 state round-trips losslessly);
- chunked-path resume matches to f32 accumulation (batch packing differs);
- a literal SIGKILL mid-dataset leaves a valid checkpoint that a fresh
  process resumes from, skipping the processed files;
- stale/mismatched checkpoints are ignored; success deletes the file.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
from fadtk_tpu.models.registry import get_model
from fadtk_tpu.models.wav2vec2 import W2V2Model
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.runner.device_pipeline import dataset_stats_device
from fadtk_tpu.runner.resume import StatsCheckpoint, pipeline_ckpt_path


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_ds")
    rng = np.random.default_rng(7)
    sr = 16000
    for i in range(8):
        t = np.arange(int(sr * 1.2)) / sr
        x = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 2000) * t)
        write_wav_int16(d / f"c{i}.wav", float_to_int16(x), sr)
    return d


@pytest.fixture(scope="module")
def w2v2():
    m = W2V2Model("base", layer=12)
    m.ensure_loaded()
    return m


class _CrashAfter:
    """Iterator wrapper that dies (like a preemption) after ``n`` items."""

    class Crash(RuntimeError):
        pass

    def __init__(self, it, n):
        self.it, self.n = iter(it), n

    def __iter__(self):
        return self

    def __next__(self):
        if self.n == 0:
            raise self.Crash()
        self.n -= 1
        return next(self.it)


def _interrupted_then_resumed(model, dataset, batch, crash_after_files, monkeypatch):
    """Run the pipeline, crash it after N files (checkpoint cadence = every
    file), then resume; returns the resumed (mu, cov, n)."""
    from fadtk_tpu.runner import convert

    ckpt_path = pipeline_ckpt_path(dataset, model)
    if ckpt_path.exists():
        ckpt_path.unlink()
    monkeypatch.setenv("FADTK_TPU_CKPT_FILES", "1")
    monkeypatch.setenv("FADTK_TPU_CKPT_SECONDS", "0")

    orig = convert.ClipLoader.iter_clips

    def crashing(self, files):
        return _CrashAfter(orig(self, files), crash_after_files)

    mesh = make_mesh(4)
    with monkeypatch.context() as m:
        m.setattr(convert.ClipLoader, "iter_clips", crashing)
        with pytest.raises(_CrashAfter.Crash):
            dataset_stats_device(model, dataset, mesh=mesh, batch=batch)

    assert ckpt_path.exists(), "crash must leave a checkpoint behind"
    out = dataset_stats_device(model, dataset, mesh=mesh, batch=batch)
    assert not ckpt_path.exists(), "success must delete the checkpoint"
    return out


def test_speech_resume_bit_identical(dataset, w2v2, monkeypatch):
    """Speech-path checkpoints land on batch == file boundaries: the resumed
    run re-batches identically, so the stats are bit-identical."""
    mesh = make_mesh(4)
    monkeypatch.setenv("FADTK_TPU_CKPT", "0")
    mu_ref, cov_ref, n_ref = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    monkeypatch.delenv("FADTK_TPU_CKPT")

    mu, cov, n = _interrupted_then_resumed(w2v2, dataset, 4, 6, monkeypatch)
    assert n == n_ref
    np.testing.assert_array_equal(mu, mu_ref)
    np.testing.assert_array_equal(cov, cov_ref)


def test_chunked_resume_matches(dataset, monkeypatch):
    """Chunked-path resume: force-flush boundaries change the batch packing,
    so the contract is f32-accumulation equality."""
    model = get_model("encodec-emb-48k")
    model.ensure_loaded()
    mesh = make_mesh(4)
    monkeypatch.setenv("FADTK_TPU_CKPT", "0")
    mu_ref, cov_ref, n_ref = dataset_stats_device(model, dataset, mesh=mesh, batch=8)
    monkeypatch.delenv("FADTK_TPU_CKPT")

    mu, cov, n = _interrupted_then_resumed(model, dataset, 8, 5, monkeypatch)
    assert n == n_ref
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
    scale = max(np.abs(cov_ref).max(), 1e-9)
    np.testing.assert_allclose(cov, cov_ref, rtol=1e-4, atol=1e-4 * scale)


def test_stale_checkpoint_ignored(dataset, w2v2, monkeypatch):
    """A checkpoint whose fingerprint doesn't match (different dataset/model)
    must be ignored, not half-applied."""
    ckpt_path = pipeline_ckpt_path(dataset, w2v2)
    ckpt = StatsCheckpoint(ckpt_path, fingerprint="not-this-dataset")
    d = w2v2.num_features
    ckpt.save((np.full(d, 1e9, np.float32), np.eye(d, dtype=np.float32),
               np.float32(12345.0)), files_done=4)

    mesh = make_mesh(4)
    monkeypatch.setenv("FADTK_TPU_CKPT", "0")
    mu_ref, cov_ref, n_ref = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    monkeypatch.delenv("FADTK_TPU_CKPT")

    mu, cov, n = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    assert n == n_ref
    np.testing.assert_array_equal(mu, mu_ref)
    assert not ckpt_path.exists()


def test_corrupt_checkpoint_ignored(tmp_path):
    p = tmp_path / "pipeline_ckpt.npz"
    p.write_bytes(b"definitely not an npz")
    ckpt = StatsCheckpoint(p, fingerprint="x")
    state, files_done = ckpt.load()
    assert state is None and files_done == 0


def test_checkpoint_roundtrip_is_lossless(tmp_path):
    """f32 state must survive save/load bit-for-bit — the basis of the
    speech-path bit-identity guarantee."""
    rng = np.random.default_rng(0)
    d = 16
    state = (
        rng.standard_normal(d).astype(np.float32),
        rng.standard_normal((d, d)).astype(np.float32),
        np.float32(123.0),
    )
    ckpt = StatsCheckpoint(tmp_path / "c.npz", fingerprint="fp")
    ckpt.save(state, files_done=42)
    loaded, files_done = ckpt.load()
    assert files_done == 42
    for a, b in zip(state, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sigkill_mid_pipeline_resumes(dataset, w2v2, tmp_path):
    """The verdict's acceptance shape: SIGKILL a real pipeline process
    mid-dataset, then resume in THIS process and match an uninterrupted run
    bit-for-bit (speech path, same batch)."""
    ckpt_path = pipeline_ckpt_path(dataset, w2v2)
    if ckpt_path.exists():
        ckpt_path.unlink()

    marker = tmp_path / "batches_done"
    # The child checkpoints after every file and touches a marker per save so
    # the parent can kill it at a moment when >=1 checkpoint exists.
    child_src = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"
os.environ["FADTK_TPU_CKPT_FILES"] = "1"
os.environ["FADTK_TPU_CKPT_SECONDS"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from fadtk_tpu.models.wav2vec2 import W2V2Model
from fadtk_tpu.parallel.mesh import make_mesh
from fadtk_tpu.runner import resume as resume_mod
from fadtk_tpu.runner.device_pipeline import dataset_stats_device

_orig_save = resume_mod.StatsCheckpoint.save
def traced_save(self, state, files_done):
    _orig_save(self, state, files_done)
    Path({str(marker)!r}).touch()
    import time; time.sleep(0.5)  # widen the kill window after a valid save
resume_mod.StatsCheckpoint.save = traced_save

m = W2V2Model("base", layer=12)
m.ensure_loaded()
dataset_stats_device(m, Path({str(dataset)!r}), mesh=make_mesh(4), batch=4)
print("CHILD_FINISHED")  # the parent should have killed us before this
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 600
        while not marker.exists():
            if proc.poll() is not None:
                out = proc.stdout.read()
                pytest.fail(f"child exited before first checkpoint:\n{out}")
            if time.time() > deadline:
                pytest.fail("child never wrote a checkpoint within 600s")
            time.sleep(0.1)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == -signal.SIGKILL

    assert ckpt_path.exists(), "SIGKILL must leave the last checkpoint intact"
    state, files_done = StatsCheckpoint(
        ckpt_path, StatsCheckpoint.fingerprint_of(w2v2, sorted(dataset.glob("*.*")))
    ).load()
    assert state is not None and 0 < files_done < 8

    mesh = make_mesh(4)
    mu, cov, n = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    assert not ckpt_path.exists()

    os.environ["FADTK_TPU_CKPT"] = "0"
    try:
        mu_ref, cov_ref, n_ref = dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    finally:
        del os.environ["FADTK_TPU_CKPT"]
    assert n == n_ref
    np.testing.assert_array_equal(mu, mu_ref)
    np.testing.assert_array_equal(cov, cov_ref)


def test_checkpointed_pass_leaves_no_stats_residue(dataset, w2v2, monkeypatch):
    """Round-5 full-suite failure: a pipeline pass whose 60 s checkpoint
    cadence fired on the loaded 1-core host would save() (mkdir the dataset's
    stats/<model>/ dir), then finalize() removed only the npz — and the
    cached path's load_stats, which keyed on DIRECTORY existence (the
    reference's check, fad.py:270, whose invariant 'dir exists => mu/cov
    exist' the checkpoint silently broke), crashed on the missing mu.npy.
    Pinned here: (a) a completed checkpointed pass removes the empty dir;
    (b) load_stats computes-and-caches when the dir exists without mu.npy."""
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    ckpt_path = pipeline_ckpt_path(dataset, w2v2)
    monkeypatch.setenv("FADTK_TPU_CKPT_FILES", "1")  # save on every file
    monkeypatch.setenv("FADTK_TPU_CKPT_SECONDS", "0")
    mesh = make_mesh(4)
    dataset_stats_device(w2v2, dataset, mesh=mesh, batch=4)
    assert not ckpt_path.exists()
    assert not ckpt_path.parent.exists(), "finalize must remove the empty dir"

    # (b) even with a leftover empty dir (an in-flight pass elsewhere, or a
    # pre-fix dataset), load_stats must fall through to computing stats.
    ckpt_path.parent.mkdir(parents=True)
    fad = FrechetAudioDistance(w2v2, load_model=True)
    for f in sorted(dataset.glob("*.wav")):
        fad.cache_embedding_file(f)
    mu, cov = fad.load_stats(dataset)
    assert mu.shape == (w2v2.num_features,)
    assert (ckpt_path.parent / "mu.npy").exists(), "stats written into the dir"
    # cleanup so other module tests see the fixture dataset unchanged
    import shutil

    shutil.rmtree(dataset / "stats")
    shutil.rmtree(dataset / "embeddings")
    shutil.rmtree(dataset / "convert", ignore_errors=True)


def test_finalize_never_removes_a_user_supplied_directory(tmp_path):
    """finalize() tidies the empty stats/<model>/ dir only in the DEFAULT
    checkpoint layout; a user-supplied --checkpoint path in a directory they
    created keeps that directory even when finalize leaves it empty."""
    user_dir = tmp_path / "my_ckpts"
    user_dir.mkdir()
    ckpt = StatsCheckpoint(user_dir / "run1.npz", fingerprint="x")
    ckpt.save((np.zeros(4, np.float32), np.zeros((4, 4), np.float32),
               np.float32(1.0)), files_done=1)
    ckpt.finalize()
    assert not (user_dir / "run1.npz").exists()
    assert user_dir.exists(), "user-created directory must survive finalize"

    default = StatsCheckpoint(
        tmp_path / "ds" / "stats" / "some-model" / "pipeline_ckpt.npz",
        fingerprint="x",
    )
    default.save((np.zeros(4, np.float32), np.zeros((4, 4), np.float32),
                  np.float32(1.0)), files_done=1)
    default.finalize()
    assert not (tmp_path / "ds" / "stats" / "some-model").exists()
