"""CLAP model-class tests (random weights): chunking parity, shapes,
normalization semantics."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"


@pytest.fixture(scope="module")
def laion():
    from fadtk_tpu.models.clap_laion import CLAPLaionModel

    m = CLAPLaionModel("audio")
    m.ensure_loaded()
    return m


def test_laion_chunk_count_and_norm(laion):
    # 10 s at 48 kHz: chunk starts at every 1 s -> 10 chunks (reference
    # fadtk/model_loader.py:395-398 keeps zero-padded tails).
    audio = np.random.default_rng(0).standard_normal(480000) * 0.2
    emb = laion.get_embedding(audio)
    assert emb.shape == (10, 512)
    # L2-normalized per chunk.
    norms = np.linalg.norm(emb.astype(np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_laion_short_audio_single_chunk(laion):
    audio = np.random.default_rng(1).standard_normal(24000) * 0.2  # 0.5 s
    emb = laion.get_embedding(audio)
    assert emb.shape == (1, 512)


def test_laion_quantization_roundtrip():
    from fadtk_tpu.models.clap_laion import CLAPLaionModel

    x = np.array([0.0, 0.5, 1.2, -1.2, 1.0 / 32767])
    q = CLAPLaionModel._quantize_roundtrip(x)
    assert q.dtype == np.float32
    assert q[2] == 1.0 and q[3] == -1.0  # clipped
    assert abs(q[1] - 0.5) < 1e-4


def test_msclap_chunks():
    from fadtk_tpu.models.clap_ms import MSCLAPModel

    m = MSCLAPModel("2023")
    m.ensure_loaded()
    # 8 s at 44.1 kHz -> starts at 0..7 s -> 8 chunks of 7 s (tails padded).
    audio = np.random.default_rng(2).standard_normal(8 * 44100) * 0.2
    emb = m.get_embedding(audio)
    assert emb.shape == (8, 1024)
    # Not normalized (msclap projection has no L2 normalize).
    norms = np.linalg.norm(emb.astype(np.float32), axis=1)
    assert not np.allclose(norms, 1.0, atol=0.3)


def test_msclap_converter_roundtrip():
    """convert_msclap_audio consumes an msclap-style tree built from our own
    param layout via a torch mirror of the projection head."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from fadtk_tpu.models.clap_ms import msclap_projection

    torch.manual_seed(0)
    # Bias-free linears, mirroring msclap/models/clap.py Projection.
    lin1 = torch.nn.Linear(16, 8, bias=False)
    lin2 = torch.nn.Linear(8, 8, bias=False)
    ln = torch.nn.LayerNorm(8)

    x = torch.randn(3, 16)
    with torch.no_grad():
        p1 = lin1(x)
        ref = ln(p1 + lin2(torch.nn.functional.gelu(p1))).numpy()

    p = {
        "linear1": {"kernel": lin1.weight.detach().numpy().T},
        "linear2": {"kernel": lin2.weight.detach().numpy().T},
        "layer_norm": {"scale": ln.weight.detach().numpy(), "bias": ln.bias.detach().numpy()},
    }
    ours = np.asarray(msclap_projection(p, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_chunked_embed_batch_matches_individual(laion):
    rng = np.random.default_rng(10)
    clips = [rng.standard_normal(n) * 0.2 for n in (96000, 48000, 144000)]
    batched = laion.embed_batch(list(clips))
    for clip, got in zip(clips, batched):
        want = laion.get_embedding(clip)
        assert got.shape == want.shape and got.dtype == np.float16
        np.testing.assert_allclose(
            got.astype(np.float32), want.astype(np.float32), atol=2e-3
        )
