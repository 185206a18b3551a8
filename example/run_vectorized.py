"""Vectorized demo (reference example/run_vectorized.py parity).

The reference sanity-checks Gymnasium's AsyncVectorEnv with 6 subprocess
envs, each paying a ~7.7 s Julia warmup. The TPU-native equivalent is the
lockstep vector env: one compiled program stepping all envs at once. Both
paths are shown; the native one is the product.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import numpy as np


def native_lockstep(num_envs=6, steps=20):
    import jax
    import jax.numpy as jnp
    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

    env = RBC2DVectorEnv(num_envs=num_envs)
    state, obs = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, 12))
    state, ts = env.step(state, actions)  # compile
    t0 = time.time()
    for _ in range(steps):
        state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    dt = time.time() - t0
    print(f"native lockstep: {num_envs} envs x {steps} steps in {dt:.2f}s "
          f"({num_envs * steps / dt:.0f} env-steps/s)")
    print("rewards:", np.asarray(ts.reward).round(3))


def gymnasium_sync(num_envs=6, steps=3):
    import gymnasium as gym
    import rbc_gym_tpu  # noqa: F401

    envs = gym.make_vec(
        "rbc_gym/RayleighBenardConvection2D-v0",
        num_envs=num_envs,
        vectorization_mode="sync",
    )
    obs, _ = envs.reset(seed=42)
    for _ in range(steps):
        obs, rewards, term, trunc, infos = envs.step(
            np.zeros(envs.action_space.shape, np.float32)
        )
    print("gymnasium sync vec:", obs.shape, rewards.round(3))
    envs.close()


if __name__ == "__main__":
    native_lockstep()
    gymnasium_sync()
