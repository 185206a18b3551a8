"""On-device checkpoint-bank generation (burn-in to turbulence).

Reference pipeline (SURVEY §3.3 / scripts/create_checkpoints_2D.sh): per
episode, seed RNG, integrate the zero-action environment for ``duration``
time units, store only the final fields. The reference runs episodes
sequentially in Julia (~2000 snapshot windows each); here ALL episodes
integrate in parallel as one batched scan on the TPU, and train/test/val
splits reproduce the reference's seed conventions (42/62/72).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.sim.grid import Grid2D, Grid3D
from rbc_gym_tpu.sim.solver2d import SimParams2D, make_solver2d
from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d
from rbc_gym_tpu.utils.checkpoints import CheckpointBank2D, CheckpointBank3D

# reference split seeds (scripts/create_checkpoints_2D.sh:18-20)
SPLIT_SEEDS = {"train": 42, "test": 62, "val": 72}
SPLIT_EPISODES = {"train": 20, "test": 10, "val": 10}


def generate_bank_2d(
    ra: float,
    n_episodes: int,
    seed: int,
    grid: Optional[Grid2D] = None,
    duration: float = 600.0,
    dt_solver: float = 0.03,
    random_kick: float = 0.2,  # reference CLI default (rbc_sim2D.jl:280)
    snapshot_interval: float = 0.3,
    dtype=jnp.float32,
    nan_guard: bool = True,
) -> CheckpointBank2D:
    """Burn in ``n_episodes`` independent turbulent states at once.

    Episode i uses key fold_in(seed, i+1), mirroring the reference's
    ``Random.seed!(seed + i)`` independence guarantee (rbc_sim2D.jl:50).
    """
    grid = grid or Grid2D(nx=96, nz=64, lx=2 * np.pi, lz=2.0)
    params = SimParams2D(
        ra=ra,
        dt_solver=dt_solver,
        heater_duration=snapshot_interval,
        random_kick=random_kick,
    )
    solver = make_solver2d(grid, params, dtype=dtype)

    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, n_episodes + 1)
    )
    fields = jax.vmap(lambda k: solver.init_random(k))(keys)

    n_windows = int(round(duration / snapshot_interval))
    action = jnp.zeros((n_episodes, params.n_heaters), dtype)

    @jax.jit
    def run(fields):
        def body(f, _):
            return solver.env_step(f, action), None

        f, _ = jax.lax.scan(body, fields, None, length=n_windows)
        return f

    fields = jax.block_until_ready(run(fields))
    b = np.asarray(fields.b, np.float64)
    if nan_guard and not np.isfinite(b).all():
        raise FloatingPointError("NaN values found during burn-in")
    return CheckpointBank2D(
        b=b,
        u=np.asarray(fields.u, np.float64),
        w=np.asarray(fields.w, np.float64),
        start_seed=seed,
    )


def generate_bank_3d(
    ra: float,
    n_episodes: int,
    seed: int,
    grid: Optional[Grid3D] = None,
    duration: float = 200.0,  # free-fall units (reference rbc_sim3D.jl:283)
    dt_solver: float = 0.01,
    random_kick: float = 0.01,
    snapshot_interval: float = 0.125,
    pr: float = 0.7,
    dtype=jnp.float32,
    nan_guard: bool = True,
) -> CheckpointBank3D:
    grid = grid or Grid3D(
        nx=32, ny=32, nz=16, lx=4 * np.pi, ly=4 * np.pi, lz=2.0
    )
    params = SimParams3D(
        ra=ra,
        pr=pr,
        dt_solver=dt_solver,
        heater_duration=snapshot_interval,
        random_kick=random_kick,
        lz=grid.lz,
    )
    solver = make_solver3d(grid, params, dtype=dtype)

    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, n_episodes + 1)
    )
    fields = jax.vmap(lambda k: solver.init_random(k))(keys)

    n_windows = int(round(duration / snapshot_interval))
    action = jnp.zeros(
        (n_episodes, params.n_heaters, params.n_heaters), dtype
    )

    @jax.jit
    def run(fields):
        def body(f, _):
            return solver.env_step(f, action), None

        f, _ = jax.lax.scan(body, fields, None, length=n_windows)
        return f

    fields = jax.block_until_ready(run(fields))
    b = np.asarray(fields.b, np.float64)
    if nan_guard and not np.isfinite(b).all():
        raise FloatingPointError("NaN values found during burn-in")
    return CheckpointBank3D(
        b=b,
        u=np.asarray(fields.u, np.float64),
        v=np.asarray(fields.v, np.float64),
        w=np.asarray(fields.w, np.float64),
        start_seed=seed,
    )
