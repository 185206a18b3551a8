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
    "RBC3DVectorEnv",
    "RBC3DGymVectorEnv",
    "EnvState2D",
    "TimeStep",
]

_LAZY = {
    "RayleighBenardConvection3DEnv": "rbc_gym_tpu.envs.rbc3d",
    "RBC3DField": "rbc_gym_tpu.envs.rbc3d",
    "RBC3DVectorEnv": "rbc_gym_tpu.envs.vector3d",
    "RBC3DGymVectorEnv": "rbc_gym_tpu.envs.vector3d",
    "EnvState3D": "rbc_gym_tpu.envs.vector3d",
    "TimeStep3D": "rbc_gym_tpu.envs.vector3d",
}


def __getattr__(name):
    # 3D classes are imported lazily so the 2D path has no 3D import cost.
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
