#!/usr/bin/env bash
# DSD100 4-stem workflow (reference: examples/dsd100/*.py + separate_dsd.py).
# Expects DSD100 layout: <DB>/Dev/<track>/{vocals,bass,drums,other}.wav (+ mixture.wav).
set -euo pipefail
DB=${1:?usage: dsd100.sh <DSD100-root> [workdir]}
WD=${2:-runs/dsd100}

convsep compute-features --preset dsd100 --audio-dir "$DB/Dev" --out "$WD/feats"
convsep train --preset dsd100 --features "$WD/feats" --workdir "$WD" --mesh-data "${MESH_DATA:-1}"
# batch-separate the whole Test split (mixtures gathered into one dir)
convsep separate-batch --preset dsd100 --params "$WD/checkpoints" \
  --input-dir "$WD/test_mixtures" -o "$WD/stems" --mesh-data "${MESH_DATA:-1}"
