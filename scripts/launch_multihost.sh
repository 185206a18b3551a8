#!/bin/bash
# Multi-host PPO launch (SURVEY §5.8). One process per host; JAX builds the
# ('host','env') mesh from jax.process_count() via
# rbc_gym_tpu.parallel.make_host_env_mesh.
#
# On TPU pods: run the same command on every worker — JAX auto-detects the
# coordinator from the TPU metadata, no variables needed:
#   bash scripts/launch_multihost.sh --num_envs 4096 ...
#
# On generic clusters (CPU/GPU or Slurm multi-node), set the standard
# variables before invoking (Slurm sets NTASKS/PROCID itself under srun):
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \
#     bash scripts/launch_multihost.sh ...
#
# run_sarl.py calls rbc_gym_tpu.parallel.initialize_distributed(), which
# reads these (or the SLURM_* aliases) and no-ops on single-process runs,
# so this launcher is a thin veneer — the training script is identical in
# every topology.
set -euo pipefail
cd "$(dirname "$0")/.."

exec python experiments/run_sarl.py "$@"
