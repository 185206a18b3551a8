"""W&B logging demo (reference example/run_wandb.py parity): per-step
reward/Nusselt logging + frame capture assembled into a video. Gated on the
wandb import (not installed on all TPU images)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

try:
    import wandb
except ImportError:
    print("wandb is not installed; install it to run this demo.")
    sys.exit(0)

import gymnasium as gym
import rbc_gym_tpu  # noqa: F401

run = wandb.init(project="rbc-gym-tpu-demo")
env = gym.make(
    "rbc_gym/RayleighBenardConvection2D-v0",
    render_mode="rgb_array",
    episode_length=30,
)
obs, info = env.reset(seed=42)
frames = []
truncated = False
while not truncated:
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    frames.append(env.render())
    wandb.log(
        {
            "reward": reward,
            "nusselt_state": info["nusselt_state"],
            "nusselt_obs": info["nusselt_obs"],
            "t": info["t"],
        }
    )
video = np.stack(frames).transpose(0, 3, 1, 2)
wandb.log({"rollout": wandb.Video(video, fps=10, format="mp4")})
env.close()
run.finish()
