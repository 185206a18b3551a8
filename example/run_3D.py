"""3D demo (reference example/run_3D.py parity): rollout with progress bar
driven by info["t"], rgb_array rendering."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gymnasium as gym
import numpy as np
from tqdm import tqdm
import rbc_gym_tpu  # noqa: F401

CHECKPOINT = os.environ.get("RBC3D_CHECKPOINT")  # optional bank path

env = gym.make(
    "rbc_gym/RayleighBenardConvection3D-v0",
    rayleigh_number=2500,
    episode_length=30,
    render_mode="rgb_array",
    checkpoint=CHECKPOINT,
)
obs, info = env.reset(seed=42)
pbar = tqdm(total=env.unwrapped.episode_length, desc="sim time")
truncated = False
while not truncated:
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    frame = env.render()
    pbar.update(info["t"] - pbar.n)
    pbar.set_postfix(nusselt=f"{info['nusselt']:.3f}")
pbar.close()
env.close()
