"""`fadtk-convert --dry-run`: validate converter <-> checkpoint key coverage
without real weights.

Motivation (round-1 VERDICT item 5): the non-HF converters (laion_clap .pt,
msclap .pth, dac .pth, cdpam .pth) were written against the published
state-dict schemas but no real checkpoint file has ever passed through them in
this offline environment — key-name drift would only surface as a KeyError at
the user's machine. The dry-run closes that loop without weights:

1. On any machine with the checkpoint:  ``fadtk-convert --dump-schema ck.pth
   ck.json`` writes the {key: shape} inventory (a few KB of text — shippable).
2. Anywhere: ``fadtk-convert <model> --dry-run ck.json`` fabricates zero
   tensors of those shapes, runs the REAL converter over a recording mapping,
   and fails if (a) the converter asks for a key the checkpoint doesn't have,
   (b) any key in the model-relevant subtree goes unconsumed (silent weight
   drop), or (c) a produced parameter's shape disagrees with the model's own
   random-init pytree.

Recorded schemas under ``weights/schemas/`` pin the converters in CI: the HF
CLAP schema is generated from the locally installed transformers ClapModel
(real ground truth); DAC/cdpam schemas are generated from the published
architecture descriptions (best effort, see each generator's docstring).
"""

from __future__ import annotations

import json
from typing import Callable

import numpy as np

from ..utils import log


class FakeTensor:
    """A shape-only tensor stand-in that records when its VALUE is consumed.

    Converters may copy/re-key the state dict freely (``dict(sd)``,
    comprehensions) — reference shuffling does not count as consumption; only
    materializing the value (torch-style .detach() chain or numpy coercion)
    marks the key as used. Structure peeking (.shape/.ndim) is free, so
    shape-driven converters (cdpam) can discover geometry without marking
    everything consumed.
    """

    def __init__(self, key: str, shape: tuple, accessed: set):
        self.key = key
        self.shape = tuple(int(s) for s in shape)
        self._accessed = accessed

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def detach(self):
        self._accessed.add(self.key)
        return self

    def cpu(self):
        return self

    def numpy(self) -> np.ndarray:
        self._accessed.add(self.key)
        return np.zeros(self.shape, np.float32)

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        self._accessed.add(self.key)
        return np.zeros(self.shape, dtype or np.float32)


def recording_state_dict(shapes: dict[str, tuple]) -> tuple[dict, set]:
    accessed: set[str] = set()
    return {k: FakeTensor(k, v, accessed) for k, v in shapes.items()}, accessed


def load_schema(path) -> dict[str, tuple]:
    """Read a {key: shape} json (the --dump-schema format)."""
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for k, v in raw.items():
        out[k] = tuple(v["shape"] if isinstance(v, dict) else v)
    return out


def dump_schema(checkpoint: str, out_path: str) -> None:
    """Dump a torch checkpoint's {key: shape} inventory to json."""
    import torch

    ck = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ck
    if isinstance(ck, dict):
        for wrap in ("state_dict", "state", "model"):
            if wrap in ck and isinstance(ck[wrap], dict):
                sd = ck[wrap]
                break
    shapes = {
        k: list(v.shape) for k, v in sd.items() if hasattr(v, "shape")
    }
    with open(out_path, "w") as f:
        json.dump(shapes, f, indent=0, sort_keys=True)
    log.info(f"Wrote {len(shapes)} key shapes to {out_path}")


def _tree_shapes(tree):
    from .store import flatten_pytree

    return {k: v.shape for k, v in flatten_pytree(tree).items()}


def dry_run_convert(
    name: str,
    schema: dict[str, tuple],
    convert: Callable[[dict], dict],
    relevant: Callable[[str], bool],
    reference_params=None,
) -> dict:
    """Run ``convert`` over fabricated tensors; raise on coverage gaps.

    relevant(key) -> True for keys belonging to the subtree this model is
    supposed to consume (e.g. 'encoder.*' for DAC — the same checkpoint also
    carries decoder/quantizer weights that are legitimately unused).
    reference_params: optional pytree (e.g. the model's random init) whose
    leaf shapes the converted output must match.
    """
    rec, accessed = recording_state_dict(schema)
    try:
        params = convert(rec)
    except KeyError as e:
        raise ValueError(
            f"{name}: converter requested a key absent from the checkpoint "
            f"schema: {e}. Key drift — update the converter."
        ) from e

    # Non-learnable torch buffers that carry no weight information — either
    # bookkeeping or deterministic index tables the JAX forward recomputes.
    ignorable = (
        "num_batches_tracked",
        "relative_position_index",
        "position_ids",
        "attn_mask",
    )
    unconsumed = [
        k for k in schema
        if relevant(k) and k not in accessed and not k.endswith(ignorable)
    ]
    if unconsumed:
        raise ValueError(
            f"{name}: {len(unconsumed)} relevant checkpoint keys were never "
            f"read — silent weight drop. First 20: {sorted(unconsumed)[:20]}"
        )

    irrelevant = [k for k in schema if not relevant(k)]
    log.info(
        f"{name}: dry-run OK — consumed {len(accessed)}/{len(schema)} keys "
        f"({len(irrelevant)} outside the model subtree, e.g. text tower/decoder)"
    )

    if reference_params is not None:
        got = _tree_shapes(params)
        want = _tree_shapes(reference_params)
        mismatches = [
            (k, got.get(k), want[k]) for k in want if got.get(k) != want[k]
        ]
        extra = [k for k in got if k not in want]
        if mismatches or extra:
            raise ValueError(
                f"{name}: converted pytree disagrees with the model's init: "
                f"mismatched={mismatches[:10]} extra={extra[:10]}"
            )
        log.info(f"{name}: converted pytree matches the model init ({len(want)} leaves)")
    return params


def dry_run_model(name: str, schema_path: str) -> None:
    """Entry used by `fadtk-convert <model> --dry-run <sd.json>`."""
    import jax

    from ..models.registry import get_model

    schema = load_schema(schema_path)
    model = get_model(name)

    if name == "dac-44kHz":
        from ..models.dac_impl import init_dac_params
        from .dac import convert_dac_encoder

        dry_run_convert(
            name,
            schema,
            lambda sd: convert_dac_encoder(sd, model.cfg),
            relevant=lambda k: k.startswith("encoder."),
            reference_params=init_dac_params(model.cfg, jax.random.PRNGKey(0)),
        )
    elif name.startswith("clap-laion"):
        from ..models.htsat import init_htsat_params
        from .clap import convert_clap_audio

        def relevant(k):
            k = k.removeprefix("module.")
            return (
                k.startswith(("audio_branch.", "audio_projection.", "audio_model."))
                and "spectrogram_extractor" not in k
                and "logmel_extractor" not in k
                # token-semantic classifier head: CLAP taps latent_output
                # before it (laion_clap get_audio_embedding), legitimately
                # unconverted like DAC's decoder subtree.
                and ".tscam_conv." not in k
                and not k.startswith("audio_branch.head.")
            )

        dry_run_convert(
            name,
            schema,
            lambda sd: convert_clap_audio(sd, model.cfg),
            relevant=relevant,
            reference_params=init_htsat_params(
                model.cfg, jax.random.PRNGKey(0), projection_dim=512
            ),
        )
    elif name == "clap-2023":
        from .clap import convert_msclap_audio

        def relevant(k):
            k = k.removeprefix("module.")
            return (
                k.startswith("audio_encoder.")
                and "spectrogram" not in k
                and "logmel_extractor" not in k
                and ".tscam_conv." not in k
                and ".htsat.head." not in k  # see the laion note above
            )

        # Reference shapes: the model's random-weight init pytree. Restore the
        # env var afterwards — leaving it set would silently flip the whole
        # process into random-weights mode (load_model would stop raising
        # MissingWeightsError for unconverted checkpoints).
        import os

        saved = os.environ.get("FADTK_TPU_RANDOM_WEIGHTS")
        os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"
        try:
            ref = get_model(name)
            ref.load_model()
        finally:
            if saved is None:
                del os.environ["FADTK_TPU_RANDOM_WEIGHTS"]
            else:
                os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = saved
        dry_run_convert(
            name,
            schema,
            lambda sd: convert_msclap_audio(sd, model.cfg),
            relevant=relevant,
            reference_params=ref.params,
        )
    elif name.startswith("cdpam"):
        from .cdpam import convert_cdpam

        dry_run_convert(
            name,
            schema,
            lambda sd: convert_cdpam(sd)[0],
            relevant=lambda k: k.startswith("base_encoder."),
        )
    else:
        raise SystemExit(
            f"--dry-run supports the non-HF converters (dac-44kHz, clap-laion-*, "
            f"clap-2023, cdpam-*); {name} converts from local HF trees which are "
            "themselves the schema."
        )
