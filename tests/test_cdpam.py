"""CDPAM tests.

The cdpam package / checkpoints are unavailable offline (no ground truth for
end-to-end numeric parity — see models/cdpam_impl.py provenance note), so
these tests pin what IS verifiable:

- torch-semantics differential: the JAX forward (conv 'same' padding, eval
  BatchNorm, LeakyReLU, masked mean pool, linear heads) equals a torch mirror
  built with standard torch layers;
- mask-exactness: a ragged tail chunk through the padded static bucket equals
  the exact-length run;
- converter: consumes a FINnet-style ``{'state': {...base_encoder...}}``
  checkpoint, infers geometry from shapes, rejects unconsumed keys;
- pipeline: reference chunking arithmetic (1 s non-overlapping, ragged tail,
  fadtk/model_loader.py:437-445), unit L2 norms, acoustic != content.
"""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"

import jax
import jax.numpy as jnp

from fadtk_tpu.models.cdpam_impl import (
    CdpamConfig,
    cdpam_forward,
    init_cdpam_params,
    l2_normalize,
)

SMALL = CdpamConfig(channels=(8, 8, 16, 16, 32), kernel_size=3, emb_dim=24,
                    chunk_samples=500)


def _rand_params(cfg, seed=0):
    return init_cdpam_params(jax.random.PRNGKey(seed), cfg)


def test_forward_shapes():
    params = _rand_params(SMALL)
    chunks = jnp.asarray(np.random.default_rng(0).normal(size=(3, 500)) * 1000,
                         jnp.float32)
    lengths = jnp.asarray([500, 500, 321], jnp.int32)
    feats, ac, co = cdpam_forward(SMALL, params, chunks, lengths)
    assert feats.shape == (3, 32)
    assert ac.shape == (3, 24) and co.shape == (3, 24)
    assert np.isfinite(np.asarray(ac)).all()


def test_padded_equals_unpadded():
    """A ragged chunk through the padded static bucket must equal running it
    alone at its exact length (per-layer valid masking makes the zero tail
    invisible — the repo's mask-exactness invariant)."""
    params = _rand_params(SMALL)
    rng = np.random.default_rng(1)
    for valid in (500, 463, 129, 32, 5, 1):
        x = rng.normal(size=(valid,)).astype(np.float32) * 3000
        exact_cfg = CdpamConfig(channels=SMALL.channels, kernel_size=3,
                                emb_dim=24, chunk_samples=valid)
        f0, a0, c0 = cdpam_forward(
            exact_cfg, params, jnp.asarray(x[None]),
            jnp.asarray([valid], jnp.int32),
        )
        padded = np.zeros((1, 500), np.float32)
        padded[0, :valid] = x
        f1, a1, c1 = cdpam_forward(
            SMALL, params, jnp.asarray(padded), jnp.asarray([valid], jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                                   rtol=1e-5, atol=1e-5)


def _torch_mirror(cfg):
    """Standard-torch-layers mirror of the reconstruction, for semantics
    differential (conv padding/stride, eval BN, LeakyReLU, mean pool, heads)."""
    import torch
    import torch.nn as nn

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.ModuleList()
            self.norms = nn.ModuleList()
            cin = 1
            for cout in cfg.channels:
                self.convs.append(
                    nn.Conv1d(cin, cout, cfg.kernel_size, stride=cfg.stride,
                              padding=(cfg.kernel_size - 1) // 2)
                )
                self.norms.append(nn.BatchNorm1d(cout))
                cin = cout
            self.fc_acoustic = nn.Linear(cin, cfg.emb_dim)
            self.fc_content = nn.Linear(cin, cfg.emb_dim)

        def forward(self, x):  # (B, 1, T)
            for conv, bn in zip(self.convs, self.norms):
                x = torch.nn.functional.leaky_relu(
                    bn(conv(x)), cfg.leaky_slope
                )
            feats = x.mean(-1)
            return feats, self.fc_acoustic(feats), self.fc_content(feats)

    torch.manual_seed(7)
    m = Mirror().eval()
    # Randomize running stats so a forward that drops them would be caught.
    with torch.no_grad():
        for bn in m.norms:
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
    return m


def test_torch_semantics_differential():
    import torch

    m = _torch_mirror(SMALL)
    sd = {f"base_encoder.{k}": v for k, v in m.state_dict().items()}

    from fadtk_tpu.weights.cdpam import convert_cdpam

    params, cfg_kwargs = convert_cdpam({"state": sd})
    assert cfg_kwargs["channels"] == SMALL.channels
    assert cfg_kwargs["kernel_size"] == 3
    assert cfg_kwargs["emb_dim"] == 24

    rng = np.random.default_rng(2)
    x = (rng.normal(size=(4, 500)) * 2000).astype(np.float32)
    with torch.no_grad():
        _, ac_t, co_t = m(torch.from_numpy(x).unsqueeze(1))
    _, ac_j, co_j = cdpam_forward(
        SMALL, params, jnp.asarray(x), jnp.asarray([500] * 4, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(ac_j), ac_t.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(co_j), co_t.numpy(), rtol=2e-4, atol=2e-4)


def test_converter_rejects_leftover_keys():
    import torch

    m = _torch_mirror(SMALL)
    sd = {f"base_encoder.{k}": v for k, v in m.state_dict().items()}
    sd["base_encoder.mystery.weight"] = torch.zeros(3, 3, 3, 3)

    from fadtk_tpu.weights.cdpam import convert_cdpam

    with pytest.raises(ValueError, match="Leftover keys.*mystery"):
        convert_cdpam({"state": sd})


def test_converter_infers_alternate_geometry(tmp_path, monkeypatch):
    """A checkpoint with different widths/kernel loads through __config__
    metadata without code changes (the no-offline-ground-truth contingency)."""
    import json

    import torch

    alt = CdpamConfig(channels=(4, 8), kernel_size=5, emb_dim=12,
                      chunk_samples=300)
    m = _torch_mirror(alt)
    sd = {f"base_encoder.{k}": v for k, v in m.state_dict().items()}

    from fadtk_tpu.weights.cdpam import convert_cdpam
    from fadtk_tpu.weights.store import save_params

    params, cfg_kwargs = convert_cdpam({"state": sd})
    assert cfg_kwargs == {"channels": (4, 8), "kernel_size": 5, "emb_dim": 12}

    params["__config__"] = np.frombuffer(
        json.dumps(cfg_kwargs).encode(), dtype=np.uint8
    )
    monkeypatch.setenv("FADTK_TPU_CHECKPOINTS", str(tmp_path))
    save_params(params, tmp_path / "cdpam.npz")

    from fadtk_tpu.models.cdpam import CdpamModel

    model = CdpamModel("acoustic")
    model.load_model()
    assert model.cfg.channels == (4, 8)
    assert model.cfg.kernel_size == 5
    emb = model.get_embedding(np.zeros(30000, np.float32))
    assert emb.shape == (-(-30000 // 22050), 12)


def test_l2_normalize_matches_torch():
    import torch
    import torch.nn.functional as F

    v = np.random.default_rng(3).normal(size=(5, 16)).astype(np.float32)
    v[2] = 0  # degenerate row exercises the eps clamp
    got = np.asarray(l2_normalize(jnp.asarray(v)))
    want = F.normalize(torch.from_numpy(v), dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["acoustic", "content"])
def test_pipeline_chunking_and_norms(mode, tmp_path):
    """Random-weight pipeline: reference chunk arithmetic + unit L2 norms."""
    from fadtk_tpu.models.registry import get_model

    model = get_model(f"cdpam-{mode}")
    model.ensure_loaded()

    sr = 22050
    t = np.arange(int(sr * 2.4)) / sr  # 2.4 s -> 3 chunks (2 full + ragged)
    audio = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.float32)
    emb = model.get_embedding(audio)
    assert emb.shape == (3, 512)
    assert emb.dtype == np.float16
    norms = np.linalg.norm(emb.astype(np.float32), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=2e-3)  # f16 storage tolerance


def test_acoustic_differs_from_content():
    from fadtk_tpu.models.registry import get_model

    a = get_model("cdpam-acoustic")
    c = get_model("cdpam-content")
    audio = (np.random.default_rng(5).normal(size=22050) * 8000).astype(np.float32)
    ea = a.get_embedding(audio)
    ec = c.get_embedding(audio)
    assert ea.shape == ec.shape == (1, 512)
    assert not np.allclose(ea, ec)


def test_embed_batch_equals_single():
    from fadtk_tpu.models.registry import get_model

    model = get_model("cdpam-acoustic")
    rng = np.random.default_rng(6)
    clips = [
        (rng.normal(size=n) * 9000).astype(np.float32)
        for n in (22050, 50000, 7001)
    ]
    model.ensure_loaded()
    batched = model.embed_batch(clips)
    single = [model.get_embedding(c) for c in clips]
    assert [b.shape for b in batched] == [(1, 512), (3, 512), (1, 512)]
    for b, s in zip(batched, single):
        np.testing.assert_allclose(
            b.astype(np.float32), s.astype(np.float32), rtol=2e-3, atol=2e-3
        )
