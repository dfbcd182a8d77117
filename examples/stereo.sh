#!/usr/bin/env bash
# Stereo-native joint-channel workflow (capability extension — the
# reference is mono-only). One fused forward separates BOTH ears, so the
# model can use inter-channel cues (panning, stereo width).
# Expects <DB>/<track>/{vocals,bass,drums,other}.wav stereo stems
# (+ optional mixture.wav); trains end-to-end from raw audio (STFT inside
# the jitted train step) and writes stereo stems.
set -euo pipefail
DB=${1:?usage: stereo.sh <audio-root> [workdir]}
WD=${2:-runs/dsd100-stereo}

# bounded run: per-epoch full-state saves move ~800 MB each on slow
# device->host links; 8 epochs + save-every-4 keeps the demo snappy
convsep train --preset dsd100-stereo --features "$DB" --workdir "$WD" --from-audio \
  --epochs "${EPOCHS:-8}" --checkpoint-every-epochs 4
TRACK=$(ls "$DB" | head -1)
convsep separate --preset dsd100-stereo --params "$WD/checkpoints" \
  -i "$DB/$TRACK/mixture.wav" -o "$WD/stems"
