#!/bin/sh
# Reset the regression harness caches (parity: reference fadtk/test/test_cleanup.sh).
# Usage: test_cleanup.sh [samples_dir]
SAMPLES="${1:-samples}"
rm -rf fad_scores comparison.csv "$SAMPLES/convert" "$SAMPLES/embeddings" "$SAMPLES/stats"
