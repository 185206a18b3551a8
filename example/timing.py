"""Timing micro-benchmark (reference example/timing.py protocol): timeit
over init / reset / step — the source of the README performance table.

The reference measures one env (0.12 s/step for dt=1 of sim time). This
script reports both the single-env gym path and the batched native path.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import timeit
import numpy as np


def time_gym_env(steps=50):
    import gymnasium as gym
    import rbc_gym_tpu  # noqa: F401

    t_init = timeit.default_timer()
    env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", heater_duration=1.0)
    obs, info = env.reset(seed=0)  # includes one-time XLA compile
    t_warm = timeit.default_timer() - t_init

    t_reset = timeit.timeit(lambda: env.reset(seed=1), number=10) / 10
    action = np.zeros(env.action_space.shape, np.float32)
    env.step(action)  # compile step program
    t_step = timeit.timeit(lambda: env.step(action), number=steps) / steps
    env.close()
    print(f"gym env:   init+compile {t_warm:.2f}s | reset {t_reset:.4f}s | "
          f"step (dt=1.0) {t_step:.4f}s")


def time_native(num_envs=1024, steps=10):
    import jax
    import jax.numpy as jnp
    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

    env = RBC2DVectorEnv(num_envs=num_envs, heater_duration=1.0)
    state, _ = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, 12))
    state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    t0 = timeit.default_timer()
    for _ in range(steps):
        state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    per_env_step = (timeit.default_timer() - t0) / (steps * num_envs)
    print(f"native vec ({num_envs} envs): {per_env_step*1e6:.1f} us/env-step "
          f"(dt=1.0) -> {0.12/per_env_step:.0f}x reference")


if __name__ == "__main__":
    time_gym_env()
    time_native()
