"""Generate the self-check golden fixtures (selfcheck/).

Runs the full pipeline with DETERMINISTIC random weights (PRNGKey(0) per model)
over the reference's bundled opus clips and records:

- selfcheck/baseline.npz  — per-model (mu, cov) from the mg-* clips
  (fma_pop.npz key format);
- selfcheck/golden.csv    — per-song + whole-set FAD for every implemented
  family (reference golden CSV format).

Purpose: the real model checkpoints are unavailable in the build environment,
so the upstream golden scores cannot be reproduced here; this self-referential
golden instead pins OUR pipeline's numerics. Future refactors run

    FADTK_TPU_RANDOM_WEIGHTS=1 python -m fadtk_tpu.test \
        --samples /root/reference/fadtk/test/samples \
        --golden selfcheck/golden.csv --baseline selfcheck/baseline.npz

and any drift > 5% mad fails with exit 2 (same gate as the reference harness).

Usage: FADTK_TPU_RANDOM_WEIGHTS=1 python scripts/make_selfcheck_golden.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

os.environ.setdefault("FADTK_TPU_RANDOM_WEIGHTS", "1")

FAMILIES = [
    "vggish",
    "encodec-emb",
    "encodec-emb-48k",
    "whisper-tiny",
    "w2v2-base",
    "MERT-v1-95M-4",
    "hubert-base",
    "wavlm-base-plus",
    "clap-laion-audio",
    "clap-2023",
    "dac-44kHz",
    "cdpam-acoustic",
    "cdpam-content",
]

SAMPLES = Path(os.environ.get("FADTK_REF_TEST", "/root/reference/fadtk/test")) / "samples"


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("selfcheck")
    out_dir.mkdir(parents=True, exist_ok=True)

    from fadtk_tpu.metric.stats import calc_embd_statistics
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.fad import FrechetAudioDistance

    files = sorted(SAMPLES.glob("*.opus"))
    assert files, f"no opus fixtures under {SAMPLES}"
    baseline_files = [f for f in files if f.stem.startswith("mg-")]

    # Work in a temp copy so caches never pollute the reference checkout.
    with tempfile.TemporaryDirectory() as tmp:
        work = Path(tmp) / "samples"
        work.mkdir()
        import shutil

        for f in files:
            shutil.copy(f, work / f.name)
        wfiles = sorted(work.glob("*.opus"))
        wbase = [f for f in wfiles if f.stem.startswith("mg-")]

        stats = {}
        columns: dict[str, dict[str, float]] = {}
        for name in FAMILIES:
            model = get_model(name)
            fad = FrechetAudioDistance(model)
            for f in wfiles:
                fad.cache_embedding_file(f)

            from fadtk_tpu.metric.stats import statistics_from_frame_iter

            mu, cov = statistics_from_frame_iter(
                (fad.read_embedding_file(f).astype(np.float64) for f in wbase),
                model.num_features,
            )
            stats[f"{model.name}.mu"] = mu
            stats[f"{model.name}.cov"] = cov

            from fadtk_tpu.metric.frechet import FrechetBaseline

            fb = FrechetBaseline(mu, cov)
            col: dict[str, float] = {}
            all_frames = []
            for f in wfiles:
                emb = fad.read_embedding_file(f)
                all_frames.append(emb)
                mu_e, cov_e = calc_embd_statistics(emb)
                col[f"samples/{f.stem}"] = fb.distance(mu_e, cov_e)
            concat = np.concatenate(all_frames, axis=0)
            mu_a, cov_a = calc_embd_statistics(concat)
            col["samples/all"] = fb.distance(mu_a, cov_a)
            columns[model.name] = col
            print(f"{model.name}: all={col['samples/all']:.6g}")

    # float32 keeps the committed fixture small; the 5% gate is insensitive.
    np.savez(out_dir / "baseline.npz", **{k: v.astype(np.float32) for k, v in stats.items()})

    song_ids = [f"samples/{f.stem}" for f in files] + ["samples/all"]
    header = ["song_id", "dataset"] + [
        f"FAD_{n.replace('-', '_')}_fma_pop" for n in FAMILIES
    ]
    lines = [",".join(header)]
    for sid in song_ids:
        row = [sid, "selfcheck"] + [f"{columns[n][sid]!r}" for n in FAMILIES]
        lines.append(",".join(row))
    (out_dir / "golden.csv").write_text("\n".join(lines) + "\n")
    print(f"wrote {out_dir}/baseline.npz and {out_dir}/golden.csv")


if __name__ == "__main__":
    main()
