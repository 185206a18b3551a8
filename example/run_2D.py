"""2D demo (reference example/run_2D.py parity): full-resolution observation
with pressure channels, zero actions, human render."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gymnasium as gym
import numpy as np
import rbc_gym_tpu  # noqa: F401

env = gym.make(
    "rbc_gym/RayleighBenardConvection2D-v0",
    render_mode="human" if os.environ.get("DISPLAY") else "rgb_array",
    observation_shape=(64, 96),
    pressure=True,
)
obs, info = env.reset(seed=42)
for _ in range(100):
    action = np.zeros(env.action_space.shape, np.float32)
    obs, reward, terminated, truncated, info = env.step(action)
    env.render()
    print(f"t={info['t']:6.1f} Nu_state={info['nusselt_state']:.3f} "
          f"reward={reward:.3f}")
    if truncated:
        break
env.close()
