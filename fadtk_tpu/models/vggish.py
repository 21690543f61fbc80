"""VGGish embedding model.

Parity target: reference fadtk/model_loader.py:89-108 — torch.hub
harritaylor/torchvggish with PCA postprocessing disabled (:100-101) and the
final ReLU stripped from the embedding head (:102-103), so the embedding is the
raw 128-d output of the last linear layer. 16 kHz, min_len = 1 s.

Architecture (VGG on (96, 64) log-mel examples):
    conv3x3(64) - pool - conv3x3(128) - pool - conv3x3(256) x2 - pool -
    conv3x3(512) x2 - pool -> (6, 4, 512) -> flatten (h, w, c) ->
    fc 4096 - relu - fc 4096 - relu - fc 128.

TPU notes: each 0.96 s example is an independent batch element — clips become
example batches, so ragged audio never pads the conv input. NHWC layout; the
frontend is fused GEMMs (dsp/mel.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.mel import vggish_log_mel_examples
from ..utils import log, next_multiple
from .base import EmbeddingModel

_CONV_CHANNELS = (64, 128, 256, 256, 512, 512)
_POOL_AFTER = {0, 1, 3, 5}  # pool after these conv indices


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vggish_forward(params, examples: jax.Array) -> jax.Array:
    """(N, 96, 64) log-mel examples -> (N, 128) embeddings.

    Compute follows the parameter dtype (models/precision.py); float32 out.
    """
    from .precision import param_dtype

    x = examples.astype(param_dtype(params))[..., None]  # NHWC
    for i, conv in enumerate(params["features"]):
        x = jax.lax.conv_general_dilated(
            x,
            conv["kernel"],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        ) + conv["bias"]
        x = jax.nn.relu(x)
        if i in _POOL_AFTER:
            x = _max_pool_2x2(x)
    n = x.shape[0]
    x = x.reshape(n, -1)  # (h, w, c) flatten == torchvggish's transpose+view
    x = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    x = jax.nn.relu(x @ params["fc2"]["kernel"] + params["fc2"]["bias"])
    # Final ReLU intentionally absent (reference strips it, model_loader.py:102-103).
    return (x @ params["fc3"]["kernel"] + params["fc3"]["bias"]).astype(jnp.float32)


def init_vggish_params(key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 32))

    def conv(cin, cout):
        s = 1.0 / math.sqrt(9 * cin)
        return {
            "kernel": jax.random.uniform(next(keys), (3, 3, cin, cout), dtype, -s, s),
            "bias": jnp.zeros((cout,), dtype),
        }

    def dense(i, o):
        s = 1.0 / math.sqrt(i)
        return {
            "kernel": jax.random.uniform(next(keys), (i, o), dtype, -s, s),
            "bias": jnp.zeros((o,), dtype),
        }

    features = []
    cin = 1
    for cout in _CONV_CHANNELS:
        features.append(conv(cin, cout))
        cin = cout
    return {
        "features": features,
        "fc1": dense(512 * 6 * 4, 4096),
        "fc2": dense(4096, 4096),
        "fc3": dense(4096, 128),
    }


_EXAMPLE_BATCH = 32  # static example-batch bucket for one-compile inference


@partial(jax.jit, static_argnames=())
def _jit_vggish(params, examples):
    return vggish_forward(params, examples)


class VGGishModel(EmbeddingModel):
    def __init__(self, use_pca: bool = False, use_activation: bool = False):
        super().__init__("vggish", 128, 16000, min_len=1)
        if use_pca or use_activation:
            raise NotImplementedError(
                "The reference registry always disables PCA and the final "
                "activation (fadtk/model_loader.py:676-701); only that "
                "configuration is implemented."
            )
        self.params = None

    def load_model(self) -> None:
        from ..weights.store import (
            MissingWeightsError,
            load_params,
            params_path,
            random_weights_enabled,
        )

        path = params_path("vggish")
        if path.exists():
            stored = load_params(path)
            stored.pop("__config__", None)
            self.params = stored
        elif random_weights_enabled():
            log.warning("vggish: using RANDOM weights (FADTK_TPU_RANDOM_WEIGHTS=1)")
            self.params = init_vggish_params(jax.random.PRNGKey(0))
        else:
            raise MissingWeightsError("vggish", "torch.hub harritaylor/torchvggish")
        self.loaded = True

    def _embed(self, audio: np.ndarray) -> np.ndarray:
        examples = vggish_log_mel_examples(jnp.asarray(audio, jnp.float32))
        n = examples.shape[0]
        if n == 0:
            return np.zeros((0, 128), np.float32)
        # Pad the example batch to a static bucket; padded rows are dropped.
        bucket = next_multiple(n, _EXAMPLE_BATCH)
        padded = jnp.concatenate(
            [examples, jnp.zeros((bucket - n, *examples.shape[1:]), examples.dtype)]
        )
        out = _jit_vggish(self.params, padded)
        return np.asarray(out[:n])

    def embed_batch(self, clips: list[np.ndarray]) -> list[np.ndarray]:
        """Cross-file example batching (0.96 s examples are independent)."""
        self.ensure_loaded()
        per_file = [
            np.asarray(vggish_log_mel_examples(jnp.asarray(c, jnp.float32)))
            for c in clips
        ]
        outs = self._batch_chunked(
            per_file,
            lambda g: _jit_vggish(self.params, jnp.asarray(g)),
            # Cross-file batches fill deep (52% MFU at 256 vs 7% at small
            # batches — bench-tuned); the single-file path keeps its small
            # bucket to avoid padding waste.
            batch_size=256,
        )
        return [o.astype(np.float16) for o in outs]

    def dp_spec(self):
        """Mesh-sharded chunk pipeline: 0.96 s log-mel examples are
        independent batch elements."""
        from ..parallel.dp import DpChunkSpec

        self.ensure_loaded()

        def mk(clip):
            ex = np.asarray(
                vggish_log_mel_examples(jnp.asarray(clip, jnp.float32))
            )
            return (ex,)

        return DpChunkSpec(
            forward=vggish_forward,
            make_chunks=mk,
            params=self.params,
            num_features=self.num_features,
            preferred_batch=256,  # 0.96 s examples are tiny; bench: 52% MFU
        )
