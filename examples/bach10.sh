#!/usr/bin/env bash
# Score-informed Bach10 workflow (reference: examples/bach10/*.py).
# Expects <DB>/<piece>/{violin,clarinet,saxophone,bassoon}.wav and
# per-instrument note annotations <piece>/<instrument>.notes.txt
# ("onset_sec offset_sec midi_pitch" per line).
set -euo pipefail
DB=${1:?usage: bach10.sh <Bach10-root> [workdir]}
WD=${2:-runs/bach10}

# --score-filter nmf swaps the harmonic-comb gating for score-constrained
# KL-NMF refinement (the reference pipeline's source-filter excitation
# variant); use the same filter at feature AND separation time.
FILTER=${SCORE_FILTER:-comb}

convsep compute-features --preset bach10 --audio-dir "$DB" --out "$WD/feats" \
  --score-informed --score-filter "$FILTER"
convsep train --preset bach10 --features "$WD/feats" --workdir "$WD" --score-informed
PIECE=$(ls "$DB" | head -1)
convsep separate --preset bach10 --params "$WD/checkpoints" \
  -i "$DB/$PIECE/mixture.wav" -o "$WD/stems" --score "$DB/$PIECE" \
  --score-filter "$FILTER"
