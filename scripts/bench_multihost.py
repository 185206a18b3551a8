#!/usr/bin/env python
"""Multi-host weak-scaling benchmark (BASELINE.md north star: linear
env-steps/s scaling to >= 2 hosts).

One process per host, envs proportional to process count
(``--num_envs_per_process`` each), the lockstep vector env sharded over
the ('host', 'env') mesh exactly as a training launch
(scripts/launch_multihost.sh -> parallel.shard_vector_env). Every process
times the same SPMD stepping program; process 0 prints ONE JSON line with
the aggregate throughput and the per-process breakdown:

  {"metric": "multihost_env_steps_per_sec_2d", "value": ..., "unit":
   "env-steps/s", "processes": N, "num_envs": total, "per_process_sec":
   [...], "envs_per_process": E}

Weak-scaling efficiency = value(N processes) / (N * value(1 process)) —
computed by running this script at both process counts; the CPU demo
launcher ``scripts/bench_multihost.sh`` does exactly that with two
jax.distributed processes on virtual CPU devices (validated in
tests/test_multihost.py style), and the same command scales to real
hardware: on TPU pods run it unmodified on every worker (JAX
auto-detects the coordinator), on generic clusters set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

Usage (single process — the scaling baseline):
  python scripts/bench_multihost.py --num_envs_per_process 512

Usage (CPU demo, 2 processes x 4 virtual devices):
  bash scripts/bench_multihost.sh
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", choices=["2d", "3d"], default="2d")
    p.add_argument("--num_envs_per_process", type=int, default=512)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--state_shape", type=int, nargs="+", default=None)
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON record to this path")
    # CPU-demo plumbing (mirrors tests/multihost_worker.py): force the CPU
    # backend with N virtual devices per process BEFORE backend init.
    p.add_argument("--cpu_devices", type=int, default=None)
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port (else env vars / auto-detect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.cpu_devices}"
            ).strip()

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rbc_gym_tpu.parallel import (
        initialize_distributed,
        make_host_env_mesh,
        shard_vector_env,
    )

    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    nproc = jax.process_count()
    num_envs = args.num_envs_per_process * nproc

    if args.dim == "2d":
        from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

        nz, nx = args.state_shape or (64, 96)
        env = RBC2DVectorEnv(
            num_envs=num_envs,
            rayleigh_number=10_000,
            state_shape=(nz, nx),
            observation_shape=(8, nx // 2),
            heater_duration=1.5,
            episode_length=300,
        )
        actions = jnp.zeros((num_envs, 12), jnp.float32)
    else:
        from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

        nz, ny, nx = args.state_shape or (16, 32, 32)
        env = RBC3DVectorEnv(
            num_envs=num_envs,
            rayleigh_number=2500,
            state_shape=(nz, ny, nx),
            heater_duration=0.125,
            dt_solver=0.01,
            episode_length=37.5,
        )
        actions = jnp.zeros((num_envs, 8, 8), jnp.float32)

    if nproc > 1:
        mesh = make_host_env_mesh()
        env = shard_vector_env(env, mesh)

    state, _ = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, actions)  # warmup/compile
    jax.block_until_ready(ts.reward)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    elapsed = time.perf_counter() - t0

    if nproc > 1:
        from jax.experimental import multihost_utils

        all_elapsed = np.asarray(
            multihost_utils.process_allgather(
                jnp.asarray([elapsed]), tiled=True
            )
        ).reshape(-1)
    else:
        all_elapsed = np.asarray([elapsed])

    # the SPMD program finishes when the slowest process does
    wall = float(all_elapsed.max())
    record = {
        "metric": f"multihost_env_steps_per_sec_{args.dim}",
        "value": round(num_envs * args.steps / wall, 1),
        "unit": "env-steps/s",
        "processes": nproc,
        "num_envs": num_envs,
        "envs_per_process": args.num_envs_per_process,
        "steps": args.steps,
        "per_process_sec": [round(float(e), 4) for e in all_elapsed],
    }
    if jax.process_index() == 0:
        print(json.dumps(record), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(record, f)


if __name__ == "__main__":
    main()
