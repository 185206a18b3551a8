"""Native pure-JAX vectorized 2D environment — the scale-out product.

The reference's only vectorization is N OS processes each embedding a full
Julia runtime (example/run_vectorized.py:11-20, SURVEY §2.7). Here the
vector environment is a single XLA program: all fields carry a leading
``(num_envs,)`` axis, ``reset``/``step`` are jitted pure functions over an
explicit ``EnvState`` pytree, and per-env RNG streams come from
``jax.random.fold_in``. Thousands of lockstep environments run per chip;
sharding the env axis over a mesh is provided by ``rbc_gym_tpu.parallel``.

Two interfaces:

* ``RBC2DVectorEnv`` — functional: ``state, obs = env.reset(key)``;
  ``state, timestep = env.step(state, actions)``. Everything stays on
  device; episode bookkeeping (autoreset on truncation) is inside the
  compiled step.
* ``RBC2DGymVectorEnv`` — a ``gymnasium.vector.VectorEnv`` adapter with
  numpy I/O for drop-in use with standard tooling.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.sim.grid import Grid2D
from rbc_gym_tpu.sim.solver2d import (
    Fields2D,
    SimParams2D,
    _hydrostatic_pressure,
    make_solver2d,
)
from rbc_gym_tpu.sim import nusselt as nu
from rbc_gym_tpu.envs.autoreset import autoreset_step
from rbc_gym_tpu.utils.checkpoints import load_bank_2d


class EnvState2D(NamedTuple):
    fields: Fields2D
    t: jax.Array  # (E,) sim time within the episode
    step: jax.Array  # (E,) int32, 1-based like the reference
    key: jax.Array  # (E, key) per-env PRNG stream


class TimeStep(NamedTuple):
    obs: jax.Array  # (E, C, nz_obs, nx_obs) — next policy input (post-autoreset)
    final_obs: jax.Array  # pre-autoreset obs (for truncation bootstrapping)
    reward: jax.Array  # (E,)
    terminated: jax.Array  # (E,) always False (no terminal state)
    truncated: jax.Array  # (E,)
    nusselt_state: jax.Array  # (E,)
    nusselt_obs: jax.Array  # (E,)
    t: jax.Array  # (E,)
    step: jax.Array  # (E,)


class RBC2DVectorEnv:
    """Functional vector env; all methods are jitted and device-resident."""

    def __init__(
        self,
        num_envs: int,
        rayleigh_number: float = 10_000,
        episode_length: float = 300,
        observation_shape: Tuple[int, int] = (8, 48),
        state_shape: Tuple[int, int] = (64, 96),
        heater_segments: int = 12,
        heater_limit: float = 0.75,
        heater_duration: float = 1.5,
        pressure: bool = False,
        checkpoint: Optional[str] = None,
        auto_reset: bool = True,
        bank_sampling: str = "random",
        ic_noise: float = 0.0,
        dtype=jnp.float32,
        poisson_precision: Optional[str] = None,
    ):
        """``bank_sampling``: how reset draws initial conditions from a
        checkpoint bank — "random" (reference semantics, random episode
        index per env, sim/rbc_sim2D.jl:178) or "sequential" (env i gets
        bank state i % bank_size; deterministic, duplicate-free up to the
        bank size — for evaluation). ``ic_noise`` adds a Gaussian kick of
        that amplitude to bank states at reset so lockstep envs sharing a
        bank index decorrelate (evaluation with more episodes than bank
        states).

        Sequential sampling governs explicit ``reset()`` calls only:
        mid-run autoresets draw RANDOM bank states, so evaluation
        protocols relying on the duplicate-free guarantee must pass
        ``auto_reset=False`` (a warning is emitted otherwise)."""
        if bank_sampling == "sequential" and auto_reset:
            import logging

            logging.getLogger(__name__).warning(
                "bank_sampling='sequential' with auto_reset=True: "
                "mid-episode autoresets draw random bank states — the "
                "duplicate-free guarantee only covers the initial "
                "reset(). Pass auto_reset=False for evaluation."
            )
        self.num_envs = num_envs
        nz, nx = state_shape
        self.grid = Grid2D(nx=nx, nz=nz, lx=2 * np.pi, lz=2.0)
        self.params = SimParams2D(
            ra=float(rayleigh_number),
            heater_duration=float(heater_duration),
            n_heaters=int(heater_segments),
            heater_limit=float(heater_limit),
        )
        self.episode_length = float(episode_length)
        self.episode_steps = int(round(self.episode_length / heater_duration))
        self.observation_shape = tuple(observation_shape)
        self.include_pressure = pressure
        self.auto_reset = auto_reset
        if bank_sampling not in ("random", "sequential"):
            raise ValueError(f"unknown bank_sampling {bank_sampling!r}")
        self.bank_sampling = bank_sampling
        self.ic_noise = float(ic_noise)
        self.dtype = dtype
        self.solver = make_solver2d(self.grid, self.params, dtype=dtype,
                                    poisson_precision=poisson_precision)

        self._bank = None
        if checkpoint is not None:
            bank = load_bank_2d(checkpoint)
            self._bank = Fields2D(
                u=jnp.asarray(bank.u, dtype),
                w=jnp.asarray(bank.w, dtype),
                b=jnp.asarray(bank.b, dtype),
                p_hy=jnp.zeros_like(jnp.asarray(bank.b, dtype)),
                p_nhs=jnp.zeros_like(jnp.asarray(bank.b, dtype)),
            )

        self.reset = jax.jit(self._reset)
        self.step = jax.jit(self._step)

    # -- init ----------------------------------------------------------
    def _fields_from_bank(self, idx: jax.Array, key: jax.Array) -> Fields2D:
        f = jax.tree_util.tree_map(lambda a: a[idx], self._bank)
        if self.ic_noise > 0.0:
            kb, ku, kw = jax.random.split(jax.random.fold_in(key, 1), 3)
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
                w=w,
            )
        p_hy = _hydrostatic_pressure(f.b, self.grid.dz, self.params.min_b)
        return f._replace(p_hy=p_hy)

    def _init_fields(self, key: jax.Array) -> Fields2D:
        """Fresh per-env initial state: checkpoint episode or random kick."""
        if self._bank is not None:
            n = self._bank.b.shape[0]
            idx = jax.random.randint(key, (), 0, n)
            return self._fields_from_bank(idx, key)
        return self.solver.init_random(key)

    def _reset(self, key: jax.Array) -> Tuple[EnvState2D, jax.Array]:
        keys = jax.random.split(key, self.num_envs)
        init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        if self._bank is not None and self.bank_sampling == "sequential":
            n = self._bank.b.shape[0]
            idx = jnp.arange(self.num_envs) % n
            fields = jax.vmap(self._fields_from_bank)(idx, init_keys)
        else:
            fields = jax.vmap(self._init_fields)(init_keys)
        state = EnvState2D(
            fields=fields,
            t=jnp.zeros(self.num_envs, self.dtype),
            step=jnp.ones(self.num_envs, jnp.int32),
            key=keys,
        )
        return state, self._observe(fields)

    # -- observation / reward ------------------------------------------
    def _channels(self, fields: Fields2D) -> jax.Array:
        nzc = self.grid.nz
        chans = [fields.b, fields.u, fields.w[..., :nzc]]
        if self.include_pressure:
            chans += [fields.p_hy, fields.p_nhs]
        return jnp.stack(chans, axis=-3)  # (E, C, nx, nz)

    def _observe(self, fields: Fields2D) -> jax.Array:
        nz_o, nx_o = self.observation_shape
        state = self._channels(fields)
        obs = nu.sensor_subsample_2d(state, nx_o, nz_o)
        return jnp.swapaxes(obs, -1, -2)  # (E, C, nz_obs, nx_obs)

    def _nusselts(self, fields: Fields2D) -> Tuple[jax.Array, jax.Array]:
        nzc = self.grid.nz
        t, w = fields.b, fields.w[..., :nzc]
        nz_o, nx_o = self.observation_shape
        ns = nu.nusselt_2d(t, w, self.params.kappa, self.params.delta_b, self.grid.lz)
        no = nu.nusselt_2d(
            nu.sensor_subsample_2d(t, nx_o, nz_o),
            nu.sensor_subsample_2d(w, nx_o, nz_o),
            self.params.kappa,
            self.params.delta_b,
            self.grid.lz,
        )
        return ns, no

    # -- step ----------------------------------------------------------
    def _step(
        self, state: EnvState2D, actions: jax.Array
    ) -> Tuple[EnvState2D, TimeStep]:
        fields = self.solver.env_step(state.fields, actions.astype(self.dtype))
        step = state.step + 1
        t = (step - 1).astype(self.dtype) * self.params.heater_duration
        truncated = (step - 1) >= self.episode_steps

        ns, no = self._nusselts(fields)
        reward = -no
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

        ts = TimeStep(
            obs=obs,
            final_obs=final_obs,
            reward=reward,
            terminated=jnp.zeros_like(truncated),
            truncated=truncated,
            nusselt_state=ns,
            nusselt_obs=no,
            t=t,
            step=step,
        )
        return EnvState2D(fields=fields, t=t, step=step, key=key), ts


class RBC2DGymVectorEnv(gym.vector.VectorEnv):
    """Gymnasium VectorEnv adapter (numpy I/O) over ``RBC2DVectorEnv``."""

    metadata = {"render_modes": []}

    def __init__(self, num_envs: int, seed: int = 0, **kwargs):
        self._env = RBC2DVectorEnv(num_envs, **kwargs)
        self.num_envs = num_envs
        nz_o, nx_o = self._env.observation_shape
        channels = 5 if self._env.include_pressure else 3
        self.single_observation_space = gym.spaces.Box(
            -np.inf, np.inf, shape=(channels, nz_o, nx_o), dtype=np.float32
        )
        self.single_action_space = gym.spaces.Box(
            -1, 1, shape=(self._env.params.n_heaters,), dtype=np.float32
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
            "nusselt_state": np.asarray(ts.nusselt_state),
            "nusselt_obs": np.asarray(ts.nusselt_obs),
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
