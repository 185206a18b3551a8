"""Gymnasium-compatible 2D Rayleigh-Bénard environment.

API parity target: reference ``envs/rbc2D.py`` (class
``RayleighBenardConvection2DEnv``): same constructor signature, spaces,
reward (-Nusselt on the sensor observation), info dict, truncation rule and
render modes. The ~7.7 s embedded-Julia warmup of the reference is replaced
by a one-time XLA compile; the solver itself is the pure-JAX stepper from
``rbc_gym_tpu.sim.solver2d``.

For RL at scale prefer ``rbc_gym_tpu.envs.vector2d.RBC2DVectorEnv`` — the
same physics with thousands of lockstep envs per chip. This class exists so
single-env Gymnasium workflows (check_env, manual rollouts, rendering) work
unchanged.
"""

from __future__ import annotations

import logging
from enum import IntEnum
from functools import lru_cache
from pathlib import Path
from typing import Any, Dict, Optional, Tuple
import warnings

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.sim.grid import Grid2D
from rbc_gym_tpu.sim.solver2d import Fields2D, SimParams2D, make_solver2d
from rbc_gym_tpu.sim import nusselt as nu
from rbc_gym_tpu.utils.checkpoints import load_bank_2d
from rbc_gym_tpu.envs.rendering import PygameRenderer2D


class RBCField(IntEnum):
    """Channel indices (reference envs/rbc2D.py:16-20)."""

    T = 0
    UX = 1
    UY = 2
    P = 3


@lru_cache(maxsize=8)
def _cached_solver(grid: Grid2D, params: SimParams2D, dtype_name: str,
                   obs_shape: tuple):
    dtype = jnp.dtype(dtype_name)
    solver = make_solver2d(grid, params, dtype=dtype)
    nz_o, nx_o = obs_shape  # python (nz, nx) order

    def diagnostics(f: Fields2D):
        """One fused device program for everything step()/reset() report."""
        nz = grid.nz
        state = jnp.stack([f.b, f.u, f.w[..., :nz], f.p_hy, f.p_nhs])
        obs = nu.sensor_subsample_2d(state, nx_o, nz_o)
        t_o = obs[0]
        w_o = obs[2]
        nus = nu.nusselt_2d(f.b, f.w[..., :nz], params.kappa, params.delta_b,
                            grid.lz)
        nuo = nu.nusselt_2d(t_o, w_o, params.kappa, params.delta_b, grid.lz)
        finite = jnp.isfinite(f.b).all() & jnp.isfinite(f.u).all()
        # transpose to python (C, nz, nx) order on device
        return (
            jnp.swapaxes(obs, -1, -2),
            jnp.swapaxes(state, -1, -2),
            nus,
            nuo,
            finite,
        )

    return solver, jax.jit(solver.env_step), jax.jit(diagnostics)


class RayleighBenardConvection2DEnv(gym.Env):
    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 10}

    def __init__(
        self,
        rayleigh_number: Optional[int] = 10_000,
        episode_length: Optional[int] = 300,
        observation_shape: Optional[list] = (8, 48),
        state_shape: Optional[list] = (64, 96),
        heater_segments: Optional[int] = 12,
        heater_limit: Optional[float] = 0.75,
        heater_duration: Optional[float] = 1.5,
        pressure: Optional[bool] = False,
        use_gpu: Optional[bool] = False,  # accepted for API parity; TPU always
        checkpoint: Optional[str] = None,
        render_mode: Optional[str] = None,
        dtype: str = "float32",
    ) -> None:
        super().__init__()
        self.closed = False
        self.checkpoint = checkpoint

        self.ra = rayleigh_number
        self.episode_length = episode_length
        self.observation_shape = tuple(observation_shape)  # (nz_obs, nx_obs)
        self.state_shape = tuple(state_shape)  # (nz, nx)
        self.temperature_difference = [1, 2]
        self.heater_segments = heater_segments
        self.heater_limit = heater_limit
        self.heater_duration = heater_duration
        self.include_pressure = pressure
        self.episode_steps = int(episode_length / heater_duration)

        self.logger = logging.getLogger(__name__)
        self.logger.info(f"Using Rayleigh number Ra={self.ra}")

        nz, nx = self.state_shape
        self._grid = Grid2D(nx=nx, nz=nz, lx=2 * np.pi, lz=2.0)
        self._params = SimParams2D(
            ra=float(rayleigh_number),
            heater_duration=float(heater_duration),
            n_heaters=int(heater_segments),
            heater_limit=float(heater_limit),
        )
        self._solver, self._step_fn, self._diag_fn = _cached_solver(
            self._grid, self._params, dtype, tuple(self.observation_shape)
        )
        self._dtype = jnp.dtype(dtype)
        self._fields: Optional[Fields2D] = None
        self._t = 0.0
        self._step_count = 1
        self._bank = None

        # --- spaces (reference envs/rbc2D.py:75-108) ---
        self.action_space = gym.spaces.Box(
            -1, 1, shape=(self.heater_segments,), dtype=np.float32
        )
        channels = 3 + (2 if pressure else 0)
        lows = [np.ones(self.observation_shape, np.float32) * 1]
        highs = [np.ones(self.observation_shape, np.float32) * 2 + heater_limit]
        for _ in range(channels - 1):
            lows.append(np.full(self.observation_shape, -np.inf, np.float32))
            highs.append(np.full(self.observation_shape, np.inf, np.float32))
        self.observation_space = gym.spaces.Box(
            np.stack(lows, axis=0),
            np.stack(highs, axis=0),
            shape=(channels, *self.observation_shape),
            dtype=np.float32,
        )

        self.render_mode = render_mode
        self._renderer = PygameRenderer2D(fps=self.metadata["render_fps"])

    # ------------------------------------------------------------------
    def reset(
        self,
        seed: int | None = None,
        options: Dict[str, Any] | None = None,
    ) -> Tuple[Any, Dict[str, Any]]:
        super().reset(seed=seed)
        if self.checkpoint:
            path = Path(self.checkpoint)
            if not path.exists():
                raise FileNotFoundError(
                    f"Checkpoint file {path} does not exist. "
                    "Please provide a valid checkpoint directory."
                )
            if self._bank is None:
                self._bank = load_bank_2d(str(path))
            idx = int(self.np_random.integers(self._bank.num_episodes))
            self.logger.info(
                f"Loading checkpoint with index: {idx} from file: {path}"
            )
            self._fields = self._fields_from_bank(idx)
        else:
            # gymnasium may draw a 128-bit entropy seed; fold into PRNGKey range
            key = jax.random.PRNGKey((self.np_random_seed or 0) % (2**63 - 1))
            self._fields = self._solver.init_random(key)

        self._t = 0.0
        self._step_count = 1
        self.last_action = np.zeros(self.action_space.shape, np.float32)
        self._refresh_diag()
        return self.__get_obs(), self.__get_info()

    def _fields_from_bank(self, idx: int) -> Fields2D:
        from rbc_gym_tpu.sim.solver2d import _hydrostatic_pressure

        b = jnp.asarray(self._bank.b[idx], self._dtype)
        u = jnp.asarray(self._bank.u[idx], self._dtype)
        w = jnp.asarray(self._bank.w[idx], self._dtype)
        p_hy = _hydrostatic_pressure(b, self._grid.dz, self._params.min_b)
        return Fields2D(u=u, w=w, b=b, p_hy=p_hy, p_nhs=jnp.zeros_like(b))

    # ------------------------------------------------------------------
    def step(
        self, action: Any = None
    ) -> Tuple[Any, float, bool, bool, Dict[str, Any]]:
        terminated = False  # no terminal state (reference envs/rbc2D.py:161)
        truncated = False
        if action is None:
            action = np.zeros(self.action_space.shape, dtype=np.float32)
            warnings.warn("No action provided, using zero action")

        self._fields = self._step_fn(
            self._fields, jnp.asarray(np.asarray(action), self._dtype)
        )
        # t = (step-1) * duration, computed multiplicatively so episodes whose
        # length is an exact multiple of the duration truncate exactly
        self._step_count += 1
        self._t = (self._step_count - 1) * self.heater_duration
        self._refresh_diag()
        if not self._diag_finite:
            raise RuntimeError("Error in simulation step, probably NaN values")

        self.last_obs = self.__get_obs()
        self.last_reward = self.__get_reward()
        self.last_info = self.__get_info()
        # The reference truncates on accumulated t >= episode_length
        # (envs/rbc2D.py:179); counting completed steps is equivalent for
        # exact-multiple configs and immune to float accumulation drift.
        if self._step_count - 1 >= self.episode_steps:
            truncated = True
        return self.last_obs, self.last_reward, terminated, truncated, self.last_info

    # ------------------------------------------------------------------
    def _refresh_diag(self) -> None:
        """Run the fused on-device diagnostics program once per step."""
        obs, state, nus, nuo, finite = self._diag_fn(self._fields)
        n_ch = 5 if self.include_pressure else 3
        self._diag_obs = np.asarray(obs[:n_ch], np.float32)
        self._diag_state = np.asarray(state[:n_ch], np.float32)
        self._diag_nu_state = float(nus)
        self._diag_nu_obs = float(nuo)
        self._diag_finite = bool(finite)

    def __get_obs(self) -> np.ndarray:
        return self._diag_obs

    def __get_reward(self) -> float:
        return -self._diag_nu_obs

    def __get_info(self) -> Dict[str, Any]:
        return {
            "t": self._t,
            "step": self._step_count,
            "nusselt_state": self._diag_nu_state,
            "nusselt_obs": self._diag_nu_obs,
            "state": self._diag_state,
        }

    # ------------------------------------------------------------------
    def render(self):
        if self.render_mode is None:
            gym.logger.warn(
                "You are calling render method without specifying any render "
                "mode. You can specify the render_mode at initialization."
            )
            return None
        temperature = self._diag_state[RBCField.T]  # (nz, nx)
        return self._renderer.render(
            temperature,
            vmin=1.0,
            vmax=2.0 + self.heater_limit,
            mode=self.render_mode,
        )

    def close(self):
        if self.closed:
            return
        self.closed = True
        self._renderer.close()
