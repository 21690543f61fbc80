"""Whole-pipeline A/B of the int16 half-byte link transport
(parallel/transfer.py) — int16 on vs off, interleaved in ONE process so the
shared-host speed drift that moved the round-4 decode floor 988 -> 492
audio-s/s between bench runs cancels out.

Times dataset_stats_device (the host-transport scoring pipeline, the e2e
default) on the same fresh 44.1k wav set with FADTK_TPU_INT16_TRANSPORT
alternating 1/0 per rep. The ONLY difference between arms is the audio
upload in runner/device_pipeline.py: int16 (~0.16 MB per 10 s clip) vs f32
(~0.32 MB) over the tunneled link. Writes .bench_cache/int16_transport.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_FILES = 64
SECONDS = 10
SRC_SR = 44100
REPS = 4  # per arm, interleaved


def main() -> None:
    os.environ["FADTK_TPU_RANDOM_WEIGHTS"] = "1"
    from fadtk_tpu.audio.wavio import float_to_int16, write_wav_int16
    from fadtk_tpu.models.registry import get_model
    from fadtk_tpu.runner.device_pipeline import dataset_stats_device
    from fadtk_tpu.utils import configure_compile_cache

    configure_compile_cache()

    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="fadtk_int16_probe_"))
    try:
        t = np.arange(SECONDS * SRC_SR) / SRC_SR
        for i in range(N_FILES):
            x = 0.25 * np.sin(2 * np.pi * float(rng.uniform(100, 2000)) * t)
            x = x + 0.02 * rng.standard_normal(t.shape[0])
            write_wav_int16(str(root / f"clip{i:04d}.wav"), float_to_int16(x), SRC_SR)

        model = get_model("w2v2-base")
        model.ensure_loaded()

        # Warm both arms' executables (identical — the rescale jit is the
        # only extra) and the decode/convert threads before any timing.
        for arm in ("1", "0"):
            os.environ["FADTK_TPU_INT16_TRANSPORT"] = arm
            dataset_stats_device(model, root, batch=16)

        walls = {"1": [], "0": []}
        for rep in range(REPS):
            for arm in ("1", "0") if rep % 2 == 0 else ("0", "1"):
                os.environ["FADTK_TPU_INT16_TRANSPORT"] = arm
                t0 = time.perf_counter()
                dataset_stats_device(model, root, batch=16)
                walls[arm].append(time.perf_counter() - t0)

        audio_s = N_FILES * SECONDS
        med = {a: float(np.median(w)) for a, w in walls.items()}
        best = {a: float(np.min(w)) for a, w in walls.items()}
        out = {
            "n_files": N_FILES,
            "seconds": SECONDS,
            "reps_per_arm": REPS,
            "int16_on_wall_s": [round(w, 3) for w in walls["1"]],
            "int16_off_wall_s": [round(w, 3) for w in walls["0"]],
            "int16_on_audio_s_per_s_median": round(audio_s / med["1"], 1),
            "int16_off_audio_s_per_s_median": round(audio_s / med["0"], 1),
            "speedup_median": round(med["0"] / med["1"], 3),
            "speedup_best": round(best["0"] / best["1"], 3),
            "host_cpu_cores": os.cpu_count(),
        }
        Path(".bench_cache").mkdir(exist_ok=True)
        Path(".bench_cache/int16_transport.json").write_text(json.dumps(out, indent=1))
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        os.environ.pop("FADTK_TPU_INT16_TRANSPORT", None)


if __name__ == "__main__":
    main()
