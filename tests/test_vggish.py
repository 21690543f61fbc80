"""VGGish tests: frontend vs an independent numpy reference of the TF-VGGish
feature pipeline, network vs a torch mirror of torchvggish, and the embed path."""

import os

import numpy as np
import pytest

os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"


# ---------------------------------------------------------------------- #
# Numpy reference of the TF-VGGish frontend (mel_features.py semantics)
# ---------------------------------------------------------------------- #


def _np_frame(data, window_length, hop_length):
    num_frames = 1 + (len(data) - window_length) // hop_length
    return np.stack(
        [data[i * hop_length : i * hop_length + window_length] for i in range(num_frames)]
    )


def _np_log_mel_examples(audio):
    from fadtk_tpu.dsp.mel import mel_filterbank, periodic_hann

    frames = _np_frame(audio.astype(np.float64), 400, 160)
    window = periodic_hann(400)
    mag = np.abs(np.fft.rfft(frames * window, 512))
    mel = mag @ mel_filterbank(64, 257, 16000, 125.0, 7500.0)
    log_mel = np.log(mel + 0.01)
    n_examples = log_mel.shape[0] // 96
    return log_mel[: n_examples * 96].reshape(n_examples, 96, 64)


def test_frontend_matches_numpy_reference():
    import jax.numpy as jnp

    from fadtk_tpu.dsp.mel import vggish_log_mel_examples

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32)
    ours = np.asarray(vggish_log_mel_examples(jnp.asarray(audio)))
    ref = _np_log_mel_examples(audio)
    assert ours.shape == ref.shape == (2, 96, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_frontend_example_count():
    import jax.numpy as jnp

    from fadtk_tpu.dsp.mel import vggish_log_mel_examples, vggish_num_examples

    for seconds, expected in [(0.9, 0), (0.975, 1), (1.0, 1), (2.0, 2), (10.0, 10)]:
        n = int(seconds * 16000)
        out = vggish_log_mel_examples(jnp.zeros(n))
        assert out.shape[0] == expected == vggish_num_examples(n), seconds


def test_network_matches_torch_mirror():
    torch = pytest.importorskip("torch")
    from torch import nn

    import jax.numpy as jnp

    from fadtk_tpu.models.vggish import vggish_forward
    from fadtk_tpu.weights.vggish import convert_vggish

    # Mirror of torchvggish's VGG (same Sequential indices as the hub model).
    layers = []
    in_ch = 1
    for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(True)]
            in_ch = v

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            # Reference strips the trailing ReLU (model_loader.py:102-103).
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128),
            )

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    torch.manual_seed(0)
    m = Mirror().eval()
    rng = np.random.default_rng(1)
    examples = rng.standard_normal((3, 96, 64)).astype(np.float32)

    with torch.no_grad():
        ref = m(torch.from_numpy(examples[:, None])).numpy()

    params = convert_vggish(m.state_dict())
    ours = np.asarray(vggish_forward(params, jnp.asarray(examples)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_vggish_embed_path():
    from fadtk_tpu.models.vggish import VGGishModel

    m = VGGishModel()
    m.ensure_loaded()
    audio = np.random.default_rng(2).standard_normal(16000 * 3) * 0.2
    emb = m.get_embedding(audio)
    assert emb.shape == (3, 128)
    assert emb.dtype == np.float16

    # Short audio: min_len pads to 1 s -> exactly 1 example.
    short = np.random.default_rng(3).standard_normal(8000) * 0.2
    emb2 = m.get_embedding(m.enforce_min_len(short))
    assert emb2.shape == (1, 128)
