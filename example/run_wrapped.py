"""Wrapper-stack demo (reference example/run_wrapped.py parity): obs/reward
normalization + reward shaping + Gymnasium FlattenObservation +
FrameStackObservation."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gymnasium as gym
from gymnasium.wrappers import FlattenObservation, FrameStackObservation
import numpy as np

import rbc_gym_tpu  # noqa: F401
from rbc_gym_tpu.wrappers import (
    RBCNormalizeObservation,
    RBCNormalizeReward,
    RBCRewardShaping,
)

env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", episode_length=15)
env = RBCNormalizeObservation(env, heater_limit=0.75, u_limit=1.3)
env = RBCNormalizeReward(env)
env = RBCRewardShaping(env, shaping_weight=0.3)
env = FlattenObservation(env)
env = FrameStackObservation(env, 4)

obs, info = env.reset(seed=42)
print("stacked obs shape:", obs.shape)
truncated = False
while not truncated:
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    print(f"t={info['t']:5.1f} reward={reward:+.3f} "
          f"cell_dist={info['cell_dist']:.3f}")
env.close()
