"""`python -m fadtk_tpu.test` — golden-score regression harness.

Behavior parity with the reference's self-test (fadtk/test/__main__.py):

- reads a golden CSV with columns ``song_id, dataset, FAD_{model}_fma_pop``;
- for each registered model that has golden data (MERT limited to layers
  1/4/8/default to bound runtime, reference :27-29): cache embeddings for the
  sample clips, per-song FAD vs the baseline via score_individual, whole-set
  FAD appended as row '/samples/all' (:55-61), cached in fad_scores/{model}.csv
  (skip-if-present, :32-34);
- verification: mad% = max_abs_diff / mean * 100 per model; PASS iff < 5
  (:93); writes comparison.csv; exit code 2 if any model fails (:104), 1 on
  embedding/scoring errors (:42-53).

The sample clips and golden CSV ship with the reference; point ``--samples`` /
``--golden`` at them (defaults try $FADTK_REF_TEST or a local copy). Models
whose converted weights are absent are reported as SKIPPED (the reference
would crash; an air-gapped TPU pod may legitimately hold only a subset).
"""

from __future__ import annotations

import csv as csv_mod
import os
import traceback
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from ..models.registry import get_all_models
from ..runner.fad import FrechetAudioDistance
from ..utils import configure_compile_cache, dataset_files, log
from ..weights.store import MissingWeightsError


def _read_golden(path: Path) -> tuple[list[str], dict[str, dict[str, float]]]:
    """-> (model names with golden data, {model: {song_id: score}})."""
    with open(path, newline="") as f:
        rows = list(csv_mod.DictReader(f))
    models = [
        c.split("_", 1)[1].removesuffix("_fma_pop")
        for c in rows[0].keys()
        if c.startswith("FAD_")
    ]
    data: dict[str, dict[str, float]] = {}
    for c in rows[0].keys():
        if not c.startswith("FAD_"):
            continue
        model = c.split("_", 1)[1].removesuffix("_fma_pop")
        data[model] = {r["song_id"]: float(r[c]) for r in rows}
    return models, data


def main() -> None:
    configure_compile_cache()  # entry point, not import time (r3 verdict #5)
    ap = ArgumentParser(prog="fadtk-test")
    default_ref = os.environ.get("FADTK_REF_TEST", "/root/reference/fadtk/test")
    ap.add_argument("--samples", type=str, default=f"{default_ref}/samples")
    ap.add_argument("--golden", type=str, default=f"{default_ref}/samples_FAD_scores.csv")
    ap.add_argument("--baseline", type=str, default="fma_pop",
                    help="baseline stats source (shipped npz name / npz path / dir)")
    ap.add_argument("--out-dir", type=str, default="fad_scores")
    ap.add_argument("--threshold", type=float, default=5.0, help="mad%% pass gate")
    ap.add_argument("--models", type=str, nargs="*", default=None)
    args = ap.parse_args()

    samples = Path(args.samples)
    golden_path = Path(args.golden)
    if not samples.is_dir() or not golden_path.is_file():
        log.error(
            f"Test fixtures not found (samples={samples}, golden={golden_path}). "
            "Point --samples/--golden (or FADTK_REF_TEST) at the reference's "
            "fadtk/test data."
        )
        raise SystemExit(1)

    reference_models, golden = _read_golden(golden_path)
    print("Models with reference data:", reference_models)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    skipped: list[str] = []

    for model in get_all_models():
        if args.models and model.name not in args.models:
            continue
        if model.name.replace("-", "_") not in reference_models:
            continue
        # Runtime-bounding parity: reference restricts MERT to layers 1/4/8/M
        # (fadtk/test/__main__.py:27-29).
        if model.name.startswith("MERT") and model.name[-1] not in ["1", "4", "8", "M"]:
            continue

        csv = out_dir / f"{model.name}.csv"
        if csv.is_file():
            continue

        log.info(f"Computing FAD score for {model.name}")
        try:
            fad = FrechetAudioDistance(model, audio_load_worker=1, load_model=True)
        except (MissingWeightsError, NotImplementedError) as e:
            log.warning(f"SKIP {model.name}: {e}")
            skipped.append(model.name)
            continue

        try:
            for f in dataset_files(samples):
                fad.cache_embedding_file(f)
        except Exception as e:
            traceback.print_exc()
            log.error(f"Error when caching embedding files for {model.name}: {e}")
            raise SystemExit(1)

        try:
            fad.score_individual(args.baseline, samples, csv)
        except Exception as e:
            traceback.print_exc()
            log.error(f"Error when computing FAD score for {model.name}: {e}")
            raise SystemExit(1)

        all_score = fad.score(args.baseline, samples)
        content = csv.read_text()
        sep = "" if (not content or content.endswith("\n")) else "\n"
        with open(csv, "a") as f:
            f.write(f"{sep}/samples/all,{all_score}\n")

    # ------------------------------------------------------------------ #
    # Verification (reference :63-98)
    # ------------------------------------------------------------------ #
    table = []
    for f in sorted(out_dir.glob("*.csv")):
        model_name = f.stem.replace("-", "_")
        rows = [line.split(",") for line in f.read_text().strip().split("\n")]
        computed: dict[str, float] = {}
        for path_str, score in rows:
            norm = path_str.replace("\\", "/")
            song = "/".join(norm.split("/")[-2:]).split(".")[0]
            computed[song] = float(score)

        test = golden.get(model_name)
        if test is None:
            continue
        got = np.array([computed[k] for k in computed])
        want = np.array([test[k] for k in computed])

        mse = float(((got - want) ** 2).mean())
        max_abs_diff = float(np.abs(got - want).max())
        mean = float(np.mean(got))
        madp = max_abs_diff / mean * 100
        table.append(
            dict(model=model_name, mse=mse, max_abs_diff=max_abs_diff,
                 mean=mean, **{"mad%": madp}, passed=madp < args.threshold)
        )

    if table:
        header = list(table[0].keys())
        print(",".join(header))
        for row in table:
            print(",".join(str(row[k]) for k in header))
        with open("comparison.csv", "w") as f:
            f.write(",".join(header) + "\n")
            for row in table:
                f.write(",".join(str(row[k]) for k in header) + "\n")

    if skipped:
        log.warning(f"Skipped (no converted weights): {skipped}")

    if table and not all(r["passed"] for r in table):
        log.error("Some models failed the test")
        raise SystemExit(2)


if __name__ == "__main__":
    main()
