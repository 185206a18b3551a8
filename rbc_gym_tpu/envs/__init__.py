"""Environment layer: Gymnasium-API envs + native JAX vector envs."""

from rbc_gym_tpu.envs.rbc2d import RayleighBenardConvection2DEnv, RBCField
from rbc_gym_tpu.envs.vector2d import (
    RBC2DVectorEnv,
    RBC2DGymVectorEnv,
    EnvState2D,
    TimeStep,
)

__all__ = [
    "RayleighBenardConvection2DEnv",
    "RayleighBenardConvection3DEnv",
    "RBC3DField",
    "RBCField",
    "RBC2DVectorEnv",
    "RBC2DGymVectorEnv",
    "EnvState2D",
    "TimeStep",
]


def __getattr__(name):
    # 3D env is imported lazily so the 2D path has no 3D import cost.
    if name in ("RayleighBenardConvection3DEnv", "RBC3DField"):
        from rbc_gym_tpu.envs import rbc3d

        return getattr(rbc3d, name)
    raise AttributeError(name)
