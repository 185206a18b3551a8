#!/usr/bin/env python
"""Actuation-energy ablation for the 3D suppression analysis.

Claim to test (docs/RL_RESULTS.md): at Ra=2500 with 8x8 tiles, ANY
tile-scale heater forcing pumps energy into the flow — Nu increases
monotonically with actuation amplitude regardless of the action's
structure. Rolls the held-out bank under iid random actions of scale
a ∈ {0, 0.1, ..., 1.0} (resampled every step, zero-mean by the env's
preprocess_action) and under constant checkerboard forcing, and prints
the Nu(amplitude) curve.

Usage: python scripts/ablate_actuation3d.py [--episodes 32] [--n-steps 80]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--n-steps", type=int, default=80)
    p.add_argument("--ra", type=float, default=2500)
    p.add_argument("--heater-duration", type=float, default=0.375)
    p.add_argument("--bank", default="data/checkpoints/test/3D_ckpt_ra2500.h5")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    env = RBC3DVectorEnv(
        num_envs=args.episodes,
        rayleigh_number=args.ra,
        heater_duration=args.heater_duration,
        checkpoint=args.bank if os.path.exists(args.bank) else None,
        auto_reset=False,
    )
    s = env.params.n_heaters
    state0, obs0 = env.reset(jax.random.PRNGKey(args.seed))

    ij = np.indices((s, s)).sum(axis=0) % 2
    checker = jnp.asarray(2.0 * ij - 1.0, jnp.float32)  # +-1 checkerboard

    @partial(jax.jit, static_argnums=(0,))
    def rollout(mode, amp):
        def step(carry, key):
            env_state, obs = carry
            if mode == "random":
                a = amp * jax.random.uniform(
                    key, (args.episodes, s, s), jnp.float32, -1.0, 1.0
                )
            else:
                a = amp * jnp.broadcast_to(checker, (args.episodes, s, s))
            env_state, ts = env.step(env_state, a)
            return (env_state, ts.obs), ts.nusselt

        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.n_steps)
        _, nus = jax.lax.scan(step, (state0, obs0), keys)
        return nus

    def second_half(nus):
        return float(np.asarray(nus)[args.n_steps // 2:].mean())

    print(f"Ra={args.ra:g} duration={args.heater_duration} "
          f"({args.episodes} episodes x {args.n_steps} steps, 2nd-half Nu)")
    print(f"{'amp':>5} {'Nu(random)':>11} {'Nu(checker)':>12}")
    for amp in (0.0, 0.1, 0.2, 0.4, 0.6, 0.8, 1.0):
        nr = second_half(rollout("random", amp))
        nc = second_half(rollout("checker", amp))
        print(f"{amp:>5.1f} {nr:>11.4f} {nc:>12.4f}", flush=True)


if __name__ == "__main__":
    main()
