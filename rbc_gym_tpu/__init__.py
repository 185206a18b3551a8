"""rbc_gym_tpu — TPU-native Rayleigh-Bénard convection RL environment suite.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RBC-Gym
(reference: MichielStraat/RBC-Gym). The reference embeds a Julia
(Oceananigans.jl) solver per process; here the solver is a pure-functional
JAX program: thousands of lockstep environments run as one XLA program on a
TPU chip, sharded over a device mesh for scale-out.

Public surface (mirrors the reference, `src/rbc_gym/__init__.py:4-38`):
  - Gymnasium IDs ``rbc_gym/RayleighBenardConvection2D-v0`` / ``...3D-v0``
  - ``rbc_gym_tpu.envs``      gym-API envs + native pure-JAX vector envs
  - ``rbc_gym_tpu.wrappers``  obs/reward normalization + reward shaping
  - ``rbc_gym_tpu.models``    periodic-pad CNN feature extractor + actor-critic
  - ``rbc_gym_tpu.rl``        on-device PPO (replaces SB3 + SubprocVecEnv)
  - ``rbc_gym_tpu.sim``       the solver itself (grid, stepper, nusselt)
"""

from gymnasium.envs.registration import register, registry
import numpy as np

__version__ = "0.1.0"


def _register() -> None:
    """Register gym IDs (same IDs/defaults as reference __init__.py:4-38)."""
    if "rbc_gym/RayleighBenardConvection2D-v0" in registry:
        return
    register(
        id="rbc_gym/RayleighBenardConvection2D-v0",
        entry_point="rbc_gym_tpu.envs:RayleighBenardConvection2DEnv",
        kwargs={
            "rayleigh_number": 10_000,
            "episode_length": 300,
            "observation_shape": (8, 48),
            "state_shape": (64, 96),
            "heater_segments": 12,
            "heater_limit": 0.75,
            "heater_duration": 1.5,
            "checkpoint": None,
            "use_gpu": False,
            "render_mode": None,
        },
    )
    register(
        id="rbc_gym/RayleighBenardConvection3D-v0",
        entry_point="rbc_gym_tpu.envs:RayleighBenardConvection3DEnv",
        kwargs={
            "rayleigh_number": 500,
            "prandtl_number": 0.7,
            "domain": [2, 4 * np.pi, 4 * np.pi],
            "state_shape": (16, 32, 32),
            "temperature_difference": [1, 2],
            "heater_segments": 8,
            "heater_limit": 0.9,
            "heater_duration": 0.125,
            "episode_length": 300,
            "checkpoint": None,
            "use_gpu": False,
            "render_mode": None,
        },
    )


_register()
