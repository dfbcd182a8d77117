#!/usr/bin/env bash
# Use a pretrained reference (Theano/Lasagne pickle) checkpoint directly.
set -euo pipefail
PKL=${1:?usage: reference_checkpoint.sh <model.pkl> <mix.wav> [outdir]}
MIX=${2:?}
OUT=${3:-stems}
convsep separate --preset dsd100 --params "$PKL" -i "$MIX" -o "$OUT"
