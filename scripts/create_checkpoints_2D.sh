#!/bin/bash
# Generate 2D initial-condition banks for train/test/val splits across the
# reference's Ra ladder (scripts/create_checkpoints_2D.sh in the reference;
# seeds 42/62/72, 20/10/10 episodes, 600 time-unit burn-in, dt=0.03).
set -euo pipefail
cd "$(dirname "$0")/.."

RAS=(10000 30000 100000 300000 1000000 3000000 10000000)
for RA in "${RAS[@]}"; do
  python scripts/create_checkpoints.py 2d --dir data/checkpoints/train \
    --seed 42 --random_inits 20 --Ra "$RA" --duration 600 --delta_t 0.03
  python scripts/create_checkpoints.py 2d --dir data/checkpoints/test \
    --seed 62 --random_inits 10 --Ra "$RA" --duration 600 --delta_t 0.03
  python scripts/create_checkpoints.py 2d --dir data/checkpoints/val \
    --seed 72 --random_inits 10 --Ra "$RA" --duration 600 --delta_t 0.03
done
