"""Device-mesh helpers for env-axis data parallelism.

Design (SURVEY §2.7 "TPU-build equivalent" column): a mesh with axes
('dp', 'env') — 'dp' spans hosts/slices, 'env' spans chips within a slice.
Environment batches shard over BOTH axes (their product); model parameters
replicate. Under jit, XLA propagates these shardings through the whole
train step and emits psum over the mesh for gradient reduction only.

On a single host these utilities are exercised against the virtual CPU mesh
(xla_force_host_platform_device_count); on real pods the same code runs
unchanged with jax.distributed initialization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "env"),
) -> Mesh:
    """Mesh over the first n_devices devices, factored as (dp, env)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 1 else 1
    assert n % dp == 0, f"{n} devices not divisible by dp={dp}"
    return Mesh(devices.reshape(dp, n // dp), axis_names=axis_names)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (env-batch) axis over all mesh axes."""
    return P(tuple(mesh.axis_names))


def shard_batch(tree, mesh: Mesh):
    """Place a pytree of (E, ...) arrays with the env axis sharded."""
    sharding = NamedSharding(mesh, batch_spec(mesh))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree
    )


class shard_vector_env:
    """Wrap a native vector env so reset/step keep the env axis sharded.

    Usage:
        mesh = make_env_mesh()
        env = shard_vector_env(RBC2DVectorEnv(num_envs=4096, ...), mesh)
        state, obs = env.reset(key)       # state arrays sharded over the mesh
        state, ts = env.step(state, a)    # one SPMD program, zero collectives
    """

    def __init__(self, env, mesh: Mesh):
        self.env = env
        self.mesh = mesh
        self.num_envs = env.num_envs
        if env.num_envs % mesh.size != 0:
            raise ValueError(
                f"num_envs={env.num_envs} must divide over {mesh.size} devices"
            )
        sharding = NamedSharding(mesh, batch_spec(mesh))
        self._step = jax.jit(env._step)
        self._reset = jax.jit(env._reset)
        self._sharding = sharding

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, key):
        state, obs = self._reset(key)
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self._sharding), state
        )
        return state, obs

    def step(self, state, actions):
        actions = jax.device_put(actions, self._sharding)
        return self._step(state, actions)
