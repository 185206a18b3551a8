"""Multi-host runtime scaffolding (SURVEY §2.7/§5.8).

The reference's entire distributed story is N OS processes with
multiprocessing pipes (example/run_vectorized.py:11-20, SB3 SubprocVecEnv).
Here scale-out is a single SPMD program over a ('host', 'env') mesh:

* the 'env' axis spans the chips within each host/slice (collectives ride
  ICI),
* the 'host' axis spans processes (collectives ride DCN),
* env-state batches shard over BOTH axes, model parameters replicate, and
  the only cross-host traffic in PPO is the gradient psum.

On a single process these helpers degrade to the local-device mesh, so the
same training script runs unchanged from a laptop CPU mesh (virtual
devices) to a multi-host pod — only the launcher changes
(scripts/launch_multihost.sh).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime if a multi-process launch is
    configured; no-op (returns False) otherwise.

    Resolution order for each parameter: explicit argument, then the
    standard environment variables (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, plus the common cluster aliases
    COORDINATOR_ADDRESS / SLURM_NTASKS / SLURM_PROCID), then JAX's own
    cluster auto-detection (TPU pods need no variables at all — pass
    coordinator_address="auto" to force initialization there).

    Safe to call more than once and safe to call in single-process runs.
    """
    if getattr(initialize_distributed, "_done", False):
        return True

    coord = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS")
    )
    nproc = num_processes if num_processes is not None else _int_env(
        "JAX_NUM_PROCESSES", _int_env("SLURM_NTASKS", None)
    )
    pid = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID", _int_env("SLURM_PROCID", None)
    )

    if coord is None and nproc in (None, 1):
        return False  # single-process run; nothing to initialize

    kwargs = {}
    if coord and coord != "auto":
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = nproc
    if pid is not None:
        kwargs["process_id"] = pid
    jax.distributed.initialize(**kwargs)
    initialize_distributed._done = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def _int_env(name: str, default):
    v = os.environ.get(name)
    return int(v) if v is not None else default


def make_host_env_mesh(
    axis_names: Tuple[str, str] = ("host", "env"),
    n_devices: Optional[int] = None,
) -> Mesh:
    """('host', 'env') mesh: hosts (DCN) on the outer axis, each host's
    local chips (ICI) on the inner axis.

    Device rows are grouped by owning process so that 'env'-axis
    collectives stay inside one host's ICI domain and only 'host'-axis
    collectives (the PPO gradient psum) cross DCN. On a single process
    this is a (1, n_local_devices) mesh over the local (or virtual) chips.

    ``n_devices`` restricts the inner axis (single-process testing only).
    """
    nproc = jax.process_count()
    if nproc == 1:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
        arr = np.asarray(devices).reshape(1, -1)
        return Mesh(arr, axis_names=axis_names)

    if n_devices is not None:
        raise ValueError("n_devices is single-process only")
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // nproc
    if per_host * nproc != len(devs):
        raise RuntimeError(
            f"{len(devs)} devices do not split evenly over {nproc} processes"
        )
    arr = np.asarray(devs).reshape(nproc, per_host)
    return Mesh(arr, axis_names=axis_names)


def shard_ppo_trainer(trainer, mesh: Mesh):
    """Shard a PPO trainer's live state over ``mesh``: env state and
    observations over the batch (env) axes, params/optimizer/key
    replicated. The jitted training iteration then runs as one SPMD
    program — XLA emits the gradient psum over the mesh and nothing else.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    repl = NamedSharding(mesh, P())
    trainer.env_state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, batch), trainer.env_state
    )
    trainer.last_obs = jax.device_put(trainer.last_obs, batch)
    trainer.train_state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), trainer.train_state
    )
    trainer.key = jax.device_put(trainer.key, repl)
    return trainer


def host_local_slice(num_envs: int) -> slice:
    """This process's slice of a globally sharded (num_envs, ...) batch —
    for host-local IO (logging, rendering, metrics) without a gather."""
    nproc, pid = jax.process_count(), jax.process_index()
    if num_envs % nproc != 0:
        raise ValueError(f"num_envs={num_envs} not divisible by {nproc} hosts")
    per = num_envs // nproc
    return slice(pid * per, (pid + 1) * per)
