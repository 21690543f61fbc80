"""Parameter pytree storage and checkpoint acquisition.

Converted weights are stored as flat .npz archives (keys are '/'-joined tree
paths; list indices are bare numbers) under the checkpoint directory
(``FADTK_TPU_CHECKPOINTS``, default ~/.cache/fadtk_tpu) — the analog of the
reference's fadtk/.model-checkpoints auto-download cache
(reference fadtk/model_loader.py:305-310, 474-479).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..models.base import checkpoint_dir
from ..utils import PathLike


def flatten_pytree(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_pytree(flat: dict[str, np.ndarray]):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(params, path: PathLike) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flatten_pytree(params))


def load_params(path: PathLike):
    with np.load(path) as data:
        return unflatten_pytree({k: data[k] for k in data.files})


def decode_config_meta(meta) -> dict:
    """Decode a stored ``__config__`` uint8 blob back to config kwargs.

    JSON round-trips tuples as lists; frozen config dataclasses must stay
    hashable (they key the jit caches), so sequence fields are re-tupled.
    """
    import json

    fields = json.loads(bytes(np.asarray(meta)).decode())
    return {k: tuple(v) if isinstance(v, list) else v for k, v in fields.items()}


def params_path(model_name: str) -> Path:
    return checkpoint_dir() / f"{model_name}.npz"


def random_weights_enabled() -> bool:
    """Explicit test/bench mode: run models with random weights instead of
    converted checkpoints (no network in CI / air-gapped TPU pods)."""
    return os.environ.get("FADTK_TPU_RANDOM_WEIGHTS", "0") == "1"


class MissingWeightsError(RuntimeError):
    def __init__(self, model_name: str, hint: str):
        super().__init__(
            f"No converted weights found for '{model_name}' at {params_path(model_name)}.\n"
            f"Run `fadtk-convert {model_name}` on a machine with the upstream "
            f"checkpoint available ({hint}), or set FADTK_TPU_RANDOM_WEIGHTS=1 "
            "for shape/pipeline testing with random weights."
        )
