#!/bin/bash
# Flow-statistics sweep driver (reference scripts/run_flowstats.sh parity).
# Runs the Nu(Ra) / max-velocity sweep point by point so a crash loses at
# most one Ra (the sweep script appends to the pickle incrementally), then
# fits the power-law / Hill constants used by the wrappers.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-300}"
NUM_ENVS="${NUM_ENVS:-1}"
RAS=(500 750 1000 1500 2000 4000 8000 16000 32000
     64000 128000 256000 512000 1000000)

for RA in "${RAS[@]}"; do
  python experiments/flowstats/flowstats_ra.py \
    --ra "$RA" --steps "$STEPS" --num_envs "$NUM_ENVS"
done

python experiments/flowstats/flowstats_fits.py \
  --out experiments/flowstats/flowstats_fits.json
