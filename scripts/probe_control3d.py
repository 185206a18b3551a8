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
    p.add_argument("--no-bank", action="store_true",
                   help="random ICs instead of the bank (use with --burnin)")
    p.add_argument("--burnin", type=int, default=0,
                   help="zero-action steps before the controlled phase "
                        "(equilibrate random ICs at Ra values with no bank)")
    p.add_argument("--gains", default="0.3,1.0,3.0,10.0")
    p.add_argument("--segments", type=int, default=8,
                   help="heater grid size S (SxS tiles) — finer tilings "
                        "probe whether actuation resolution limits control")
    p.add_argument("--heater-limit", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    use_bank = (not args.no_bank) and os.path.exists(args.bank)
    env = RBC3DVectorEnv(
        num_envs=args.episodes,
        rayleigh_number=args.ra,
        heater_duration=args.heater_duration,
        heater_segments=args.segments,
        heater_limit=args.heater_limit,
        checkpoint=args.bank if use_bank else None,
        auto_reset=False,
    )
    s = env.params.n_heaters  # 8x8 grid
    nz, ny, nx = env.grid.nz, env.grid.ny, env.grid.nx
    py, px = ny // s, nx // s

    state_r, obs_r = env.reset(jax.random.PRNGKey(args.seed))
    zero_a = jnp.zeros((args.episodes, s, s))
    if args.burnin:
        @jax.jit
        def burn(carry):
            def step(c, _):
                st, _ = c
                st, ts = env.step(st, zero_a)
                return (st, ts.obs), None
            c, _ = jax.lax.scan(step, carry, None, length=args.burnin)
            return c
        state_r, obs_r = burn((state_r, obs_r))
    state0, obs0 = state_r, obs_r

    def tiled_fluct(field2d):
        # (E, ny, nx) -> (E, s, s) tile means, mean-subtracted
        e = field2d.shape[0]
        tiles = field2d.reshape(e, s, py, s, px).mean(axis=(2, 4))
        return tiles - tiles.mean(axis=(-2, -1), keepdims=True)

    def law_T(obs, gain, row):
        # oppose near-plate temperature fluctuation (cool under hot)
        return jnp.clip(-gain * tiled_fluct(obs[:, 0, row]), -1.0, 1.0)

    def law_w(obs, gain, row):
        # heat under downwelling fluid (w<0) to brake the circulation
        return jnp.clip(-gain * tiled_fluct(obs[:, 3, row]), -1.0, 1.0)

    laws = {"T": law_T, "w": law_w}

    from functools import partial

    # gain is a TRACED argument so the gain/sign sweep reuses one compile
    # per (law, row); law/row stay static.
    @partial(jax.jit, static_argnums=(0, 1))
    def rollout(law_name_, row, gain):
        def step(carry, _):
            env_state, obs = carry
            if law_name_ == "zero":
                a = zero_a
            else:
                a = laws[law_name_](obs, gain, row)
            env_state, ts = env.step(env_state, a)
            return (env_state, ts.obs), ts.nusselt

        _, nus = jax.lax.scan(step, (state0, obs0), None, length=args.n_steps)
        return nus

    def second_half(nus):
        return float(np.asarray(nus)[args.n_steps // 2:].mean())

    gains = [float(g) for g in args.gains.split(",")]
    nu_zero = second_half(rollout("zero", 0, 0.0))
    print(f"Ra={args.ra:g} duration={args.heater_duration} "
          f"burnin={args.burnin} zero-action Nu: {nu_zero:.4f}", flush=True)
    for law_name in laws:
        rows = (1, 2, 4) if law_name == "T" else (nz // 2,)
        for row in rows:
            for gain in gains:
                for sign in (+1.0, -1.0):
                    nu = second_half(rollout(law_name, row, sign * gain))
                    supp = 100.0 * (nu_zero - nu) / nu_zero
                    print(f"{law_name} row={row:2d} gain={sign*gain:+6.2f}: "
                          f"Nu={nu:.4f}  supp={supp:+.2f}%", flush=True)


if __name__ == "__main__":
    main()
