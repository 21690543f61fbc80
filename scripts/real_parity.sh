#!/usr/bin/env bash
# One-command REAL-WEIGHT parity gate (round-1 VERDICT "what's missing" #3).
#
# The offline build environment has no model checkpoints and no fma_pop
# baseline, so the reference's actual acceptance gate — per-song + whole-set
# FAD on the bundled clips vs the published samples_FAD_scores.csv, mad% < 5
# (reference fadtk/test/__main__.py:63-98) — has never executed here. Run this
# script on a machine WITH network access (or pre-staged artifacts) to execute
# it end-to-end. Exit 0 = full numeric parity with microsoft/fadtk.
#
# Prereqs on the networked machine:
#   pip install fadtk-tpu (this repo) + torch + transformers
#   a microsoft/fadtk checkout (for the golden CSV + test clips + fma_pop.npz)
#
# Usage:
#   scripts/real_parity.sh /path/to/microsoft-fadtk-checkout [workdir]

set -euo pipefail

REF=${1:?usage: real_parity.sh <microsoft-fadtk checkout> [workdir]}
WORK=${2:-$(mktemp -d)}
export FADTK_TPU_CHECKPOINTS=${FADTK_TPU_CHECKPOINTS:-$WORK/checkpoints}
export FADTK_TPU_BASELINES=${FADTK_TPU_BASELINES:-$WORK/baselines}
mkdir -p "$FADTK_TPU_CHECKPOINTS" "$FADTK_TPU_BASELINES"

echo "== 1. Baseline statistics: adopt the reference's fma_pop.npz verbatim"
# Key format is identical ({model}.mu/.cov, reference fadtk/package.py:34-42).
# If the checkout's copy is a stripped LFS pointer, fetch it or regenerate via
# fadtk-package over the FMA-Pop audio (datasets/fma_pop_tracks.csv).
cp "$REF/fadtk/stats/fma_pop.npz" "$FADTK_TPU_BASELINES/fma_pop.npz"

echo "== 2. Convert every checkpoint (auto-downloads via HF/torch.hub)"
fadtk-convert --all-speech
fadtk-convert vggish encodec-emb encodec-emb-48k
fadtk-convert whisper-tiny whisper-base whisper-small whisper-medium whisper-large
# Non-HF checkpoints: download the same files the reference auto-fetches
# (fadtk/model_loader.py:300-310, 471-479; `dac download`; cdpam pip cache).
[ -f "$WORK/630k-audioset-best.pt" ] && fadtk-convert clap-laion-audio --checkpoint "$WORK/630k-audioset-best.pt"
[ -f "$WORK/music_audioset_epoch_15_esc_90.14.pt" ] && fadtk-convert clap-laion-music --checkpoint "$WORK/music_audioset_epoch_15_esc_90.14.pt"
[ -f "$WORK/CLAP_weights_2023.pth" ] && fadtk-convert clap-2023 --checkpoint "$WORK/CLAP_weights_2023.pth"
[ -f "$WORK/weights_44khz.pth" ] && fadtk-convert dac-44kHz --checkpoint "$WORK/weights_44khz.pth"
[ -f "$WORK/scratch_loss.pth" ] && fadtk-convert cdpam-acoustic --checkpoint "$WORK/scratch_loss.pth"

echo "== 3. The reference's own golden gate: mad% < 5 against the published scores"
python -m fadtk_tpu.test \
    --samples "$REF/fadtk/test/samples" \
    --golden "$REF/fadtk/test/samples_FAD_scores.csv"
echo "PARITY GATE PASSED"
