"""`fadtk-package` / `python -m fadtk_tpu.cli.package` — package a directory's
statistics for all models into one .npz baseline file.

Parity with the reference (fadtk/package.py:7-42): embeds the directory with
every registered model, computes per-model (mu, cov), and saves an .npz keyed
'{model}.mu' / '{model}.cov' — the exact format of the shipped fma_pop.npz
(lookup fadtk/fad.py:263-266). This command regenerates such baselines.

Additions: `--models` to restrict the sweep (the reference hard-loops all ~120
variants, fadtk/package.py:30), and confirmation prompt parity for non-.npz
output names.
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from ..models.registry import get_all_models
from ..runner.fad import FrechetAudioDistance
from ..utils import configure_compile_cache, log


def main() -> None:
    configure_compile_cache()  # entry point, not import time (r3 verdict #5)
    ap = ArgumentParser(prog="fadtk-package")
    ap.add_argument("directory", type=str)
    ap.add_argument("out", type=str)
    ap.add_argument("-w", "--workers", type=int, default=8)
    ap.add_argument("-s", "--sox-path", type=str, default="/usr/bin/sox",
                    help="(accepted for reference compatibility; unused)")
    ap.add_argument("--models", type=str, nargs="*", default=None,
                    help="restrict to these model names (default: all)")
    args = ap.parse_args()

    out = Path(args.out)
    if out.suffix != ".npz":
        print("The output file you specified is not a npz file, are you sure? (y/N)")
        if input().lower() != "y":
            raise SystemExit(1)

    models = get_all_models()
    if args.models:
        wanted = set(args.models)
        models = [m for m in models if m.name in wanted]
        missing = wanted - {m.name: m for m in models}.keys()
        if missing:
            raise SystemExit(f"Unknown models: {sorted(missing)}")

    # 1. Embeddings for every model (shared-backbone variants grouped: one
    # forward serves all layer taps of a family).
    from ..runner.batch import cache_embedding_files_multi

    cache_embedding_files_multi(models, args.directory, workers=args.workers)

    # 2. Statistics for every model.
    data = {}
    for model in models:
        fad = FrechetAudioDistance(model, load_model=False)
        mu, cov = fad.load_stats(args.directory)
        data[f"{model.name}.mu"] = mu
        data[f"{model.name}.cov"] = cov

    # 3. Save.
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **data)
    log.info(f"Packaged statistics for {len(models)} models into {out}")


if __name__ == "__main__":
    main()
