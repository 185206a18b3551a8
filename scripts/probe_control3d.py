#!/usr/bin/env python
"""Controllability probe for the 3D env (see probe_control2d.py).

Proportional feedback on the tile-averaged temperature fluctuation at a
near-bottom sensor row, opposing plumes through the 8x8 heater grid. The
env's preprocess_action (mean-subtract + K-normalize, reference
sim/rbc_sim3D.jl:111-128) composes cleanly with this law since the command
is already zero-mean.

Usage: python scripts/probe_control3d.py [--episodes 32] [--n-steps 80]
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

    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    env = RBC3DVectorEnv(
        num_envs=args.episodes,
        rayleigh_number=args.ra,
        heater_duration=args.heater_duration,
        checkpoint=args.bank if os.path.exists(args.bank) else None,
        auto_reset=False,
    )
    s = env.params.n_heaters  # 8x8 grid
    nz, ny, nx = env.grid.nz, env.grid.ny, env.grid.nx
    py, px = ny // s, nx // s

    state0, obs0 = env.reset(jax.random.PRNGKey(args.seed))

    def controller(obs, gain, row):
        # obs: (E, 4, nz, ny, nx); channel 0 = T, row indexes z from bottom.
        t = obs[:, 0, row]  # (E, ny, nx)
        e = t.shape[0]
        tiles = t.reshape(e, s, py, s, px).mean(axis=(2, 4))  # (E, s, s)
        fluct = tiles - tiles.mean(axis=(-2, -1), keepdims=True)
        return jnp.clip(-gain * fluct, -1.0, 1.0)

    def rollout(action_fn):
        def step(carry, _):
            env_state, obs = carry
            env_state, ts = env.step(env_state, action_fn(obs))
            return (env_state, ts.obs), ts.nusselt

        _, nus = jax.lax.scan(step, (state0, obs0), None, length=args.n_steps)
        return nus

    rollout_j = jax.jit(rollout, static_argnums=0)

    def second_half(nus):
        return float(np.asarray(nus)[args.n_steps // 2:].mean())

    nu_zero = second_half(rollout_j(lambda o: jnp.zeros((args.episodes, s, s))))
    print(f"zero-action Nu (2nd half of {args.n_steps} steps): {nu_zero:.4f}")
    for row in (0, 1, 2, 4):
        for gain in (1.0, 3.0, 10.0, 30.0):
            nu = second_half(
                rollout_j(lambda o, g=gain, r=row: controller(o, g, r))
            )
            supp = 100.0 * (nu_zero - nu) / nu_zero
            print(f"row={row} gain={gain:5.1f}: Nu={nu:.4f}  "
                  f"suppression vs zero = {supp:+.2f}%")


if __name__ == "__main__":
    main()
