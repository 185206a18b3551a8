"""Checkpoint demo (reference example/run_checkpoint.py parity): reset the
2D env from a turbulent initial-condition bank."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gymnasium as gym
import numpy as np
import rbc_gym_tpu  # noqa: F401

# Works with both reference-generated and TPU-regenerated banks.
CKPT = os.environ.get(
    "RBC_CHECKPOINT", "data/checkpoints/train/ckpt_ra10000.h5"
)

env = gym.make(
    "rbc_gym/RayleighBenardConvection2D-v0",
    checkpoint=CKPT,
    episode_length=15,
)
obs, info = env.reset(seed=42)
print(f"reset from bank: Nu_state={info['nusselt_state']:.3f} (turbulent)")
truncated = False
while not truncated:
    obs, reward, terminated, truncated, info = env.step(
        np.zeros(env.action_space.shape, np.float32)
    )
    print(f"t={info['t']:5.1f} Nu={info['nusselt_state']:.3f}")
env.close()
