#!/bin/bash
# Generate 3D initial-condition banks (reference scripts/create_checkpoints_3D.sh:
# Ra=2500, N=32x32x16, 200 free-fall-unit burn-in).
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/create_checkpoints.py 3d --dir data/checkpoints/train \
  --seed 42 --random_inits 20 --Ra 2500 --duration 200
python scripts/create_checkpoints.py 3d --dir data/checkpoints/test \
  --seed 62 --random_inits 10 --Ra 2500 --duration 200
python scripts/create_checkpoints.py 3d --dir data/checkpoints/val \
  --seed 72 --random_inits 10 --Ra 2500 --duration 200
