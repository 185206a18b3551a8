"""Native pure-JAX vectorized 3D environment (see vector2d for the design)."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.sim.solver3d import (
    Fields3D,
    SimParams3D,
    _hydrostatic_pressure_3d,
    make_solver3d,
)
from rbc_gym_tpu.sim import nusselt as nu
from rbc_gym_tpu.envs.autoreset import autoreset_step
from rbc_gym_tpu.utils.checkpoints import load_bank_3d


class EnvState3D(NamedTuple):
    fields: Fields3D
    t: jax.Array
    step: jax.Array
    key: jax.Array


class TimeStep3D(NamedTuple):
    obs: jax.Array  # (E, 4, nz, ny, nx) — next policy input (post-autoreset)
    final_obs: jax.Array  # pre-autoreset obs (for truncation bootstrapping)
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    nusselt: jax.Array
    t: jax.Array
    step: jax.Array


class RBC3DVectorEnv:
    def __init__(
        self,
        num_envs: int,
        rayleigh_number: float = 2500,
        prandtl_number: float = 0.7,
        domain: Tuple[float, float, float] = (2, 4 * np.pi, 4 * np.pi),
        state_shape: Tuple[int, int, int] = (16, 32, 32),
        temperature_difference: Tuple[float, float] = (1, 2),
        heater_segments: int = 8,
        heater_limit: float = 0.9,
        heater_duration: float = 0.125,
        episode_length: float = 300,
        dt_solver: float = 0.01,
        checkpoint: Optional[str] = None,
        checkpoint_idx: Optional[int] = None,
        auto_reset: bool = True,
        bank_sampling: str = "random",
        ic_noise: float = 0.0,
        dtype=jnp.float32,
        fused=None,
        poisson_precision: Optional[str] = None,
    ):
        """``bank_sampling`` / ``ic_noise``: see RBC2DVectorEnv — sequential
        duplicate-free bank draws and IC decorrelation noise for
        evaluation.

        ``bank_sampling="sequential"`` governs explicit ``reset()`` calls
        only: env i gets bank state ``i % bank_size``. Mid-run autoresets
        draw RANDOM bank states, so evaluation protocols that rely on the
        duplicate-free guarantee must pass ``auto_reset=False`` (a warning
        is emitted otherwise). ``checkpoint_idx`` (pin every env to one
        bank state) contradicts sequential sampling and raises."""
        if bank_sampling == "sequential":
            if checkpoint_idx is not None:
                raise ValueError(
                    "checkpoint_idx and bank_sampling='sequential' conflict: "
                    "sequential assigns env i bank state i % bank_size, "
                    "checkpoint_idx pins all envs to one state"
                )
            if auto_reset:
                import logging

                logging.getLogger(__name__).warning(
                    "bank_sampling='sequential' with auto_reset=True: "
                    "mid-episode autoresets draw random bank states — the "
                    "duplicate-free guarantee only covers the initial "
                    "reset(). Pass auto_reset=False for evaluation."
                )
        self.num_envs = num_envs
        nz, ny, nx = state_shape
        lz, ly, lx = domain
        self.grid = Grid3D(nx=nx, ny=ny, nz=nz, lx=lx, ly=ly, lz=lz)
        min_b = float(temperature_difference[0])
        delta_b = float(temperature_difference[1] - temperature_difference[0])
        self.params = SimParams3D(
            ra=float(rayleigh_number),
            pr=float(prandtl_number),
            min_b=min_b,
            delta_b=delta_b,
            dt_solver=float(dt_solver),
            heater_duration=float(heater_duration),
            n_heaters=int(heater_segments),
            heater_limit=float(heater_limit),
            lz=float(lz),
        )
        self._t_per_step = self.params.heater_duration * self.params.t_ff
        self.episode_steps = int(round(float(episode_length) / self._t_per_step))
        self.auto_reset = auto_reset
        if bank_sampling not in ("random", "sequential"):
            raise ValueError(f"unknown bank_sampling {bank_sampling!r}")
        self.bank_sampling = bank_sampling
        self.ic_noise = float(ic_noise)
        self.dtype = dtype
        self.checkpoint_idx = checkpoint_idx
        # Big grids: chunk the WHOLE env step (solver + observe + Nusselt)
        # through lax.map at the env level — transients scale with the
        # chunk, not the fleet (solver-level chunking is disabled to avoid
        # double-mapping). See solver3d.env_step for the rationale.
        self._big_grid = (self.grid.nz + 1) * self.grid.ny > 2 * 17 * 32
        self._env_chunk = 128 if self._big_grid else None
        self.solver = make_solver3d(
            self.grid, self.params, dtype=dtype, fused=fused,
            poisson_precision=poisson_precision,
            env_chunk=None if self._big_grid else "auto",
        )

        self._bank = None
        if checkpoint is not None:
            bank = load_bank_3d(checkpoint)
            self._bank = Fields3D(
                u=jnp.asarray(bank.u, dtype),
                v=jnp.asarray(bank.v, dtype),
                w=jnp.asarray(bank.w, dtype),
                b=jnp.asarray(bank.b, dtype),
                p_hy=jnp.zeros_like(jnp.asarray(bank.b, dtype)),
                p_nhs=jnp.zeros_like(jnp.asarray(bank.b, dtype)),
            )

        self.reset = jax.jit(self._reset)
        # Big grids donate the incoming state so XLA reuses its ~GBs of
        # field buffers for the output (the documented calling convention
        # is the replace pattern ``state, ts = env.step(state, a)``; at
        # 32x64x64 x 1024 envs the non-donated copy alone breaks HBM).
        big_grid = (self.grid.nz + 1) * self.grid.ny > 2 * 17 * 32
        self.step = (
            jax.jit(self._step, donate_argnums=0)
            if big_grid
            else jax.jit(self._step)
        )

    def _fields_from_bank(self, idx: jax.Array, key: jax.Array) -> Fields3D:
        f = jax.tree_util.tree_map(lambda a: a[idx], self._bank)
        if self.ic_noise > 0.0:
            kb, ku, kv, kw = jax.random.split(jax.random.fold_in(key, 1), 4)
            eps = self.ic_noise
            p = self.params
            w = f.w + eps * jax.random.normal(kw, f.w.shape, self.dtype)
            w = w.at[..., 0].set(0.0).at[..., -1].set(0.0)
            f = f._replace(
                b=jnp.clip(
                    f.b + eps * jax.random.normal(kb, f.b.shape, self.dtype),
                    p.min_b, p.min_b + p.delta_b,
                ),
                u=f.u + eps * jax.random.normal(ku, f.u.shape, self.dtype),
                v=f.v + eps * jax.random.normal(kv, f.v.shape, self.dtype),
                w=w,
            )
        p_hy = _hydrostatic_pressure_3d(f.b, self.grid.dz, self.params.min_b)
        return f._replace(p_hy=p_hy)

    def _init_fields(self, key: jax.Array) -> Fields3D:
        if self._bank is not None:
            n = self._bank.b.shape[0]
            if self.checkpoint_idx is not None:
                idx = jnp.asarray(self.checkpoint_idx)
            else:
                idx = jax.random.randint(key, (), 0, n)
            return self._fields_from_bank(idx, key)
        return self.solver.init_random(key)

    def _reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        if self._bank is not None and self.bank_sampling == "sequential":
            n = self._bank.b.shape[0]
            idx = jnp.arange(self.num_envs) % n
            fields = jax.vmap(self._fields_from_bank)(idx, init_keys)
        else:
            fields = jax.vmap(self._init_fields)(init_keys)
        state = EnvState3D(
            fields=fields,
            t=jnp.zeros(self.num_envs, self.dtype),
            step=jnp.ones(self.num_envs, jnp.int32),
            key=keys,
        )
        return state, self._observe(fields)

    def _observe(self, fields: Fields3D) -> jax.Array:
        nz = self.grid.nz
        state = jnp.stack(
            [fields.b, fields.u, fields.v, fields.w[..., :nz]], axis=-4
        )  # (E, 4, nx, ny, nz)
        return jnp.swapaxes(state, -1, -3)  # (E, 4, nz, ny, nx)

    def _step(self, state: EnvState3D, actions: jax.Array):
        c = self._env_chunk
        e = self.num_envs
        if c and e > c and e % c == 0:
            n_ch = e // c
            s_hw = (self.params.n_heaters, self.params.n_heaters)
            a = jnp.broadcast_to(
                jnp.asarray(actions, self.dtype), (e,) + s_hw
            ).reshape((n_ch, c) + s_hw)
            st = jax.tree_util.tree_map(
                lambda q: q.reshape((n_ch, c) + q.shape[1:]), state
            )
            out_state, ts = jax.lax.map(
                lambda sa: self._step_core(sa[0], sa[1]), (st, a)
            )
            unflat = lambda q: q.reshape((e,) + q.shape[2:])
            return (
                jax.tree_util.tree_map(unflat, out_state),
                jax.tree_util.tree_map(unflat, ts),
            )
        return self._step_core(state, actions)

    def _step_core(self, state: EnvState3D, actions: jax.Array):
        fields = self.solver.env_step(state.fields, actions.astype(self.dtype))
        step = state.step + 1
        t = (step - 1).astype(self.dtype) * self._t_per_step
        truncated = (step - 1) >= self.episode_steps

        nz = self.grid.nz
        nus = nu.nusselt_3d(
            fields.b,
            fields.w[..., :nz],
            self.params.kappa,
            self.params.min_b,
            self.params.delta_b,
        )
        final_obs = self._observe(fields)

        if self.auto_reset:
            fields, key, obs = autoreset_step(
                fields, state.key, truncated, final_obs,
                self._init_fields, self._observe,
            )
            t = jnp.where(truncated, 0.0, t)
            step = jnp.where(truncated, 1, step)
        else:
            obs = final_obs
            key = state.key

        ts = TimeStep3D(
            obs=obs,
            final_obs=final_obs,
            reward=-nus,
            terminated=jnp.zeros_like(truncated),
            truncated=truncated,
            nusselt=nus,
            t=t,
            step=step,
        )
        return EnvState3D(fields=fields, t=t, step=step, key=key), ts


class RBC3DGymVectorEnv(gym.vector.VectorEnv):
    """Gymnasium VectorEnv adapter (numpy I/O) over ``RBC3DVectorEnv``."""

    metadata = {"render_modes": []}

    def __init__(self, num_envs: int, seed: int = 0, **kwargs):
        self._env = RBC3DVectorEnv(num_envs, **kwargs)
        self.num_envs = num_envs
        nz, ny, nx = (
            self._env.grid.nz,
            self._env.grid.ny,
            self._env.grid.nx,
        )
        s = self._env.params.n_heaters
        self.single_observation_space = gym.spaces.Box(
            -np.inf, np.inf, shape=(4, nz, ny, nx), dtype=np.float32
        )
        self.single_action_space = gym.spaces.Box(
            -1, 1, shape=(s, s), dtype=np.float32
        )
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self._seed = seed
        self._state = None

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._seed = seed
        self._state, obs = self._env.reset(jax.random.PRNGKey(self._seed))
        return np.asarray(obs, np.float32), {}

    def step(self, actions):
        self._state, ts = self._env.step(self._state, jnp.asarray(actions))
        info = {
            "t": np.asarray(ts.t),
            "step": np.asarray(ts.step),
            "nusselt": np.asarray(ts.nusselt),
        }
        return (
            np.asarray(ts.obs, np.float32),
            np.asarray(ts.reward, np.float32),
            np.asarray(ts.terminated),
            np.asarray(ts.truncated),
            info,
        )

    def close_extras(self, **kwargs):
        pass
