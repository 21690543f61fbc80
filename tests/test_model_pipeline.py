"""End-to-end pipeline tests with random weights: model class -> embedding cache
-> statistics -> FAD score, exercising the same call stack as the reference CLI
(SURVEY.md 3.1), plus the weight store roundtrip."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
from fadtk_tpu.models.wav2vec2 import W2V2Model
from fadtk_tpu.runner.fad import FrechetAudioDistance


def _make_dataset(tmp_path, name, n_files, seed, sr=16000, seconds=2.0):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        t = np.arange(int(sr * seconds)) / sr
        f0 = rng.uniform(100, 2000)
        x = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(t.shape)
        write_wav_int16(d / f"clip{i}.wav", float_to_int16(x), sr)
    return d


@pytest.fixture(scope="module")
def w2v2():
    m = W2V2Model("base", layer=12)
    m.ensure_loaded()
    return m


def test_embed_shape_and_dtype(w2v2):
    audio = np.random.default_rng(0).standard_normal(32000) * 0.1
    emb = w2v2.get_embedding(audio)
    assert emb.dtype == np.float16  # storage downcast parity
    assert emb.shape[1] == 768
    # w2v2 frame rate is 49.9 Hz: 2 s -> 99 frames
    assert emb.shape[0] == w2v2.cfg.num_output_frames(32000)


def test_embed_all_layers(w2v2):
    audio = np.random.default_rng(1).standard_normal(16000) * 0.1
    all_layers = w2v2.embed_all_layers(audio)
    assert all_layers.shape[0] == 13
    single = w2v2.get_embedding(audio)
    np.testing.assert_allclose(
        all_layers[12].astype(np.float16), single, rtol=0, atol=0
    )


def test_cache_score_e2e(tmp_path, w2v2):
    baseline = _make_dataset(tmp_path, "baseline", 4, seed=0)
    eval_dir = _make_dataset(tmp_path, "eval", 3, seed=99)

    fad = FrechetAudioDistance(w2v2, load_model=False)
    for d in (baseline, eval_dir):
        for f in sorted(d.glob("*.wav")):
            fad.cache_embedding_file(f)

    # Cache layout parity (SURVEY.md 1: the filesystem cache contract).
    assert (baseline / "convert" / "16000" / "clip0.wav").exists()
    assert (baseline / "embeddings" / w2v2.name / "clip0.npy").exists()

    score = fad.score(baseline, eval_dir)
    assert np.isfinite(score) and score > 0
    assert (baseline / "stats" / w2v2.name / "mu.npy").exists()

    # Idempotency: second run must not recompute (mtime unchanged).
    p = baseline / "embeddings" / w2v2.name / "clip0.npy"
    mtime = p.stat().st_mtime_ns
    fad.cache_embedding_file(sorted(baseline.glob("*.wav"))[0])
    assert p.stat().st_mtime_ns == mtime

    # Self-score is ~0 (up to sqrtm noise on rank-deficient covariances —
    # n_frames < dim here, same order as the reference's general-eig path).
    self_score = fad.score(baseline, baseline)
    assert abs(self_score) < 1e-3


def test_score_individual_and_inf(tmp_path, w2v2):
    baseline = _make_dataset(tmp_path, "base2", 4, seed=5)
    eval_dir = _make_dataset(tmp_path, "eval2", 3, seed=7)
    fad = FrechetAudioDistance(w2v2, load_model=False)
    for d in (baseline, eval_dir):
        for f in sorted(d.glob("*.wav")):
            fad.cache_embedding_file(f)

    csv = fad.score_individual(baseline, eval_dir, tmp_path / "indiv.csv")
    rows = csv.read_text().strip().split("\n")
    assert len(rows) == 3
    scores = [float(r.split(",")[1]) for r in rows]
    assert scores == sorted(scores, key=abs)  # sorted by |score| parity

    inf = fad.score_inf(baseline, sorted(eval_dir.glob("*.wav")), steps=5, min_n=50)
    assert np.isfinite(inf.score)
    assert len(inf.points) == 5
    # Seeded: same seed -> same result.
    inf2 = fad.score_inf(baseline, sorted(eval_dir.glob("*.wav")), steps=5, min_n=50)
    assert inf.score == inf2.score


def test_weight_store_roundtrip(tmp_path):
    import jax

    from fadtk_tpu.models.speech.config import SpeechEncoderConfig
    from fadtk_tpu.models.speech.encoder import init_speech_encoder_params
    from fadtk_tpu.weights.store import load_params, save_params

    cfg = SpeechEncoderConfig(
        conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = init_speech_encoder_params(cfg, jax.random.PRNGKey(0))
    save_params(params, tmp_path / "p.npz")
    loaded = load_params(tmp_path / "p.npz")

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embed_batch_matches_individual(w2v2):
    """Cross-file batched inference must equal per-clip embeddings exactly."""
    rng = np.random.default_rng(11)
    clips = [
        (rng.standard_normal(n) * 0.1).astype(np.float64)
        for n in (16000, 24000, 31999, 16000, 8000)
    ]
    batched = w2v2.embed_batch(list(clips))
    for clip, got in zip(clips, batched):
        want = w2v2.get_embedding(clip)
        assert got.dtype == np.float16
        np.testing.assert_array_equal(got, want)


def test_score_individual_drops_too_short_embeddings(tmp_path, w2v2):
    """A file whose embedding has < 2 frames errors per-file and is dropped
    (reference behavior: fadtk/fad.py:380-383,391)."""
    baseline = _make_dataset(tmp_path, "b3", 3, seed=1)
    eval_dir = _make_dataset(tmp_path, "e3", 2, seed=2)
    fad = FrechetAudioDistance(w2v2, load_model=False)
    for d in (baseline, eval_dir):
        for f in sorted(d.glob("*.wav")):
            fad.cache_embedding_file(f)

    # Corrupt one eval embedding to a single frame.
    bad = eval_dir / "embeddings" / w2v2.name / "clip0.npy"
    np.save(bad, np.load(bad)[:1])

    csv = fad.score_individual(baseline, eval_dir, tmp_path / "i3.csv")
    rows = csv.read_text().strip().split("\n")
    assert len(rows) == 1  # only the intact file survives
    assert "clip1" in rows[0]


def test_load_embeddings_max_count(tmp_path, w2v2):
    """max_count early-stops by cumulative frames (reference fad.py:230-237)."""
    d = _make_dataset(tmp_path, "mc", 4, seed=3)
    fad = FrechetAudioDistance(w2v2, load_model=False)
    for f in sorted(d.glob("*.wav")):
        fad.cache_embedding_file(f)

    full = fad.load_embeddings(d, concat=True)
    per_file = full.shape[0] // 4
    partial, files = fad.load_embeddings(d, max_count=per_file + 1, concat=False)
    # Stops after the file that crosses the threshold: exactly 2 files read.
    assert len(partial) == 2
    assert len(files) == 4  # parity: the full file list is returned


def test_registry_count_matches_reference_enumeration():
    """Reference enumerates 143 always-on variants (fadtk/model_loader.py:676-695)
    + DAC + 2x CDPAM when importable (:696-699) = 146; we register all."""
    from fadtk_tpu.models.registry import get_all_models

    models = get_all_models()
    assert len(models) == 146
    assert len({m.name for m in models}) == 146  # names unique


def test_int16_transport_bit_identical():
    """Speech embed_batch ships 16-bit-PCM-exact batches as int16 (half the
    host->device bytes); the device rescale must be bit-identical to the f32
    path, and non-PCM float audio must still go through unchanged."""
    import jax.numpy as jnp

    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.models.speech.family import _jitted_forward, _scan_flag

    m = get_model("w2v2-base")
    m.ensure_loaded()

    rng = np.random.default_rng(3)
    ints = rng.integers(-(2**15), 2**15, size=16000)
    ints[0] = -(2**15)  # full-scale -1.0 (hard-clipped sample) must still ship int16
    pcm = (ints / 32768.0).astype(np.float32)          # int16-exact
    arb = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # not exact

    out_pcm = m.embed_batch([pcm])[0]
    out_arb = m.embed_batch([arb])[0]

    # Reference: force the f32 path through the raw jitted forward at the
    # SAME bucketed shape embed_batch uses (a different pad length compiles a
    # different executable whose fusion drifts f16 ulps).
    from fadtk_tpu.models.speech.family import BUCKET_SECONDS

    fwd = _jitted_forward(m.cfg, (m.layer,), _scan_flag())
    bucket = BUCKET_SECONDS * m.sr

    def ref_embed(clip):
        padded = np.zeros((1, bucket), np.float32)
        padded[0, : clip.shape[0]] = clip
        states, mask = fwd(m.params, padded, np.asarray([clip.shape[0]], np.int32))
        nf = int(np.asarray(mask[0]).sum())
        return np.asarray(states[0, 0, :nf].astype(jnp.float16))

    np.testing.assert_array_equal(out_pcm, ref_embed(pcm))
    np.testing.assert_array_equal(out_arb, ref_embed(arb))


def test_chunked_int16_transport_bit_identical():
    """_batch_chunked ships PCM-exact chunk batches as int16 via the shared
    helper; results must equal the f32 path bitwise, and non-PCM chunk
    content (e.g. mel examples) must pass through unconverted."""
    from fadtk_tpu.models import base as mbase

    rng = np.random.default_rng(9)
    ints = rng.integers(-(2**15), 2**15, size=(5, 1000))
    pcm_chunks = (ints / 32768.0).astype(np.float32)
    mel_like = rng.standard_normal((5, 1000)).astype(np.float32)

    shipped = mbase._ship_int16_if_exact(pcm_chunks)
    assert shipped is not None
    np.testing.assert_array_equal(np.asarray(shipped), pcm_chunks)
    assert mbase._ship_int16_if_exact(mel_like) is None

    calls = []

    def fwd(g):
        calls.append(type(g).__name__)
        return np.asarray(g).sum(axis=1, keepdims=True)

    out = mbase.EmbeddingModel._batch_chunked([pcm_chunks, mel_like], fwd, batch_size=4)
    ref = [pcm_chunks.sum(axis=1, keepdims=True), mel_like.sum(axis=1, keepdims=True)]
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-6)
