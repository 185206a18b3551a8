"""Wrapper layer: gym wrappers (reference parity) + jittable functional kin."""

from rbc_gym_tpu.wrappers.rbc_normalize_observation import RBCNormalizeObservation
from rbc_gym_tpu.wrappers.rbc_normalize_reward import RBCNormalizeReward
from rbc_gym_tpu.wrappers.rbc_reward_shaping import RBCRewardShaping

__all__ = ["RBCNormalizeObservation", "RBCNormalizeReward", "RBCRewardShaping"]
