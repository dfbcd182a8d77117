#!/usr/bin/env bash
# iKala vocal/accompaniment workflow (reference: examples/ikala/*.py).
# Expects the MIREX iKala clips (stereo wavs: ch0 accompaniment, ch1 voice).
set -euo pipefail
DB=${1:?usage: ikala.sh <iKala-wav-dir> [workdir]}
WD=${2:-runs/ikala}

convsep compute-features --preset ikala --audio-dir "$DB" --out "$WD/feats" --layout ikala-stereo
convsep train --preset ikala --features "$WD/feats" --workdir "$WD"
convsep separate --preset ikala --params "$WD/checkpoints" -i "$DB/$(ls "$DB" | head -1)" -o "$WD/stems"
