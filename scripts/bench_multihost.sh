#!/bin/bash
# Weak-scaling demo/CI harness for scripts/bench_multihost.py: measures the
# single-process baseline, then a 2-process jax.distributed run with the
# SAME envs-per-process, and prints the parallel efficiency
#   value(2 proc) / (2 * value(1 proc)).
#
# Runs on this image today (CPU backend, N virtual devices per process —
# the code path is identical to a pod launch minus the hardware); on real
# multi-host TPU, run bench_multihost.py directly on every worker instead
# (no flags needed — JAX auto-detects the pod) and compare against the
# recorded single-host line the same way.
#
# Usage: bash scripts/bench_multihost.sh [envs_per_process] [steps] [devices]
set -euo pipefail
cd "$(dirname "$0")/.."

ENVS=${1:-64}
STEPS=${2:-5}
DEVS=${3:-4}
OUT=${BENCH_MULTIHOST_OUT:-/tmp/bench_multihost}
mkdir -p "$OUT"

PORT=$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("localhost", 0)); print(s.getsockname()[1])
s.close()
EOF
)

echo "=== 1-process baseline (${ENVS} envs, ${DEVS} virtual devices)" >&2
python scripts/bench_multihost.py --cpu_devices "$DEVS" \
  --num_envs_per_process "$ENVS" --steps "$STEPS" \
  --state_shape 16 32 --out "$OUT/p1.json"

echo "=== 2-process weak scaling (${ENVS} envs/process)" >&2
for PID in 0 1; do
  python scripts/bench_multihost.py --cpu_devices "$DEVS" \
    --coordinator "localhost:$PORT" --num_processes 2 --process_id "$PID" \
    --num_envs_per_process "$ENVS" --steps "$STEPS" \
    --state_shape 16 32 --out "$OUT/p2.json" &
  WORKER_PIDS[$PID]=$!
done
for PID in 0 1; do
  wait "${WORKER_PIDS[$PID]}"
done

python - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
p1 = json.load(open(f"{out}/p1.json"))
p2 = json.load(open(f"{out}/p2.json"))
eff = p2["value"] / (p2["processes"] * p1["value"])
print(json.dumps({
    "metric": "multihost_weak_scaling_efficiency_2d",
    "value": round(eff, 3),
    "unit": "fraction",
    "baseline_env_steps_per_sec": p1["value"],
    "scaled_env_steps_per_sec": p2["value"],
    "processes": p2["processes"],
    "envs_per_process": p2["envs_per_process"],
}))
EOF
