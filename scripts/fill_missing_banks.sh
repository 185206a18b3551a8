#!/bin/bash
# Generate any missing checkpoint banks (idempotent: skips existing files).
# Covers the reference's full Ra ladder (scripts/create_checkpoints_2D.sh)
# and the 3D bank (scripts/create_checkpoints_3D.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

gen2d() { # ra dir seed inits
  local f="data/checkpoints/$2/ckpt_ra$1.h5"
  [ -f "$f" ] && { echo "skip $f"; return; }
  python scripts/create_checkpoints.py 2d --dir "data/checkpoints/$2" \
    --seed "$3" --random_inits "$4" --Ra "$1" --duration 600 --delta_t 0.03
}

gen3d() { # ra dir seed inits
  local f="data/checkpoints/$2/3D_ckpt_ra$1.h5"
  [ -f "$f" ] && { echo "skip $f"; return; }
  python scripts/create_checkpoints.py 3d --dir "data/checkpoints/$2" \
    --seed "$3" --random_inits "$4" --Ra "$1" --duration 200
}

gen3d 2500 train 42 20
gen3d 2500 test 62 10
gen3d 2500 val 72 10

# Low-Ra rungs for the 3D controllability map (round-5: the reference's
# registered 3D default is Ra=500, src/rbc_gym/__init__.py:21-38) and the
# round-4 high-Ra rungs.
for RA in 500 1000 8000 16000; do
  gen3d "$RA" train 42 20
  gen3d "$RA" test 62 10
  gen3d "$RA" val 72 10
done

for RA in 30000 100000 300000 1000000 3000000 10000000; do
  gen2d "$RA" train 42 20
  gen2d "$RA" test 62 10
  gen2d "$RA" val 72 10
done
echo "all banks present"
