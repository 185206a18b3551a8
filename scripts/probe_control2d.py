#!/usr/bin/env python
"""Controllability probe: hand-crafted proportional controller on the 2D env.

Before trusting any RL result (positive or negative), check that the task
itself is controllable: a simple linear feedback law — cool the plate under
hot (rising) fluid, heat it under cold (sinking) fluid — is known to
suppress 2D RBC convection at moderate Ra (the physical mechanism the RL
policy must discover; cf. the reference's task framing, README.md "suppress
convective heat transport", reward = -Nu).

For each (gain, sensor-row) pair the controller maps the observed
temperature fluctuation per heater segment to an opposing heater command.
Prints a small table of mean Nusselt (second half of the horizon) vs the
zero-action baseline over the same held-out initial conditions.

Usage: python scripts/probe_control2d.py [--episodes 32] [--n-steps 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--n-steps", type=int, default=100)
    p.add_argument("--ra", type=float, default=10_000)
    p.add_argument("--bank", default="data/checkpoints/test/ckpt_ra10000.h5")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--gains", default="1.0,3.0,10.0,30.0",
                   help="comma-separated proportional gains to sweep")
    args = p.parse_args()
    gains = tuple(float(g) for g in args.gains.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

    env = RBC2DVectorEnv(
        num_envs=args.episodes,
        rayleigh_number=args.ra,
        checkpoint=args.bank if os.path.exists(args.bank) else None,
        auto_reset=False,
    )
    n_heaters = env.params.n_heaters
    nz_o, nx_o = env.observation_shape
    assert nx_o % n_heaters == 0
    per_seg = nx_o // n_heaters

    state0, obs0 = env.reset(jax.random.PRNGKey(args.seed))

    def controller(obs, gain, row):
        # obs: (E, C, nz_obs, nx_obs); channel 0 = T, row indexes z from the
        # bottom. Segment-average the fluctuation, act against it.
        t_row = obs[:, 0, row, :]  # (E, nx_obs)
        t_seg = t_row.reshape(t_row.shape[0], n_heaters, per_seg).mean(-1)
        fluct = t_seg - t_seg.mean(axis=-1, keepdims=True)
        return jnp.clip(-gain * fluct, -1.0, 1.0)

    def rollout(action_fn):
        def step(carry, _):
            env_state, obs = carry
            env_state, ts = env.step(env_state, action_fn(obs))
            return (env_state, ts.obs), ts.nusselt_state

        _, nus = jax.lax.scan(step, (state0, obs0), None, length=args.n_steps)
        return nus

    rollout_j = jax.jit(rollout, static_argnums=0)

    def second_half(nus):
        return float(np.asarray(nus)[args.n_steps // 2:].mean())

    nu_zero = second_half(rollout_j(lambda o: jnp.zeros((args.episodes, n_heaters))))
    print(f"zero-action Nu (2nd half of {args.n_steps} steps): {nu_zero:.4f}")
    for row in (0, 1, 2, 4):
        for gain in gains:
            nu = second_half(
                rollout_j(lambda o, g=gain, r=row: controller(o, g, r))
            )
            supp = 100.0 * (nu_zero - nu) / nu_zero
            print(f"row={row} gain={gain:5.1f}: Nu={nu:.4f}  "
                  f"suppression vs zero = {supp:+.2f}%")


if __name__ == "__main__":
    main()
