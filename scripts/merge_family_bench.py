"""Fold a partial family-sweep JSON (e.g. a targeted re-bench after an
optimization) into BENCH_FAMILIES.json, recomputing pct_of_measured_roofline
against the file's measured_matmul_tf denominators.

Usage: python scripts/merge_family_bench.py .bench_cache/families_fastgelu.json
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MAIN = ROOT / "BENCH_FAMILIES.json"

_ROW_KEYS = ("audio_sec_per_sec", "mfu_pct", "gflops_per_call", "ms_per_call")


def merge(partial_path: str) -> None:
    main = json.loads(MAIN.read_text())
    part = json.loads(Path(partial_path).read_text())
    measured = main.get("measured_matmul_tf", {})
    for fam, dtypes in part.items():
        if not isinstance(dtypes, dict) or fam in ("measured_matmul_tf",):
            continue
        for dt, row in dtypes.items():
            if not isinstance(row, dict) or "audio_sec_per_sec" not in row:
                continue
            dst = main.setdefault(fam, {}).setdefault(dt, {})
            for k in _ROW_KEYS:
                if k in row:
                    dst[k] = row[k]
            if "note" in row and "note" not in dst:
                dst["note"] = row["note"]
            tf = measured.get(dt)
            if tf and row.get("ms_per_call"):
                rate_tf = row["gflops_per_call"] / row["ms_per_call"]
                dst["pct_of_measured_roofline"] = round(100 * rate_tf / tf, 2)
            print(
                f"{fam:18s} {dt:9s} a-s/s={dst['audio_sec_per_sec']:>9}"
                f" roofline%={dst.get('pct_of_measured_roofline')}"
            )
    MAIN.write_text(json.dumps(main, indent=1) + "\n")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        merge(p)
