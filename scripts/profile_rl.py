#!/usr/bin/env python
"""Training-loop profile: where does a PPO iteration spend its time?

Verdict r2 weak #3: training throughput (908 env-steps/s at 256 envs) was
3.6x below the bare 3D env (3273 @4096) with no breakdown. This script
times, at several env counts:

  env      - the bare vector-env step loop (no policy), the solver ceiling
  rollout  - trainer._rollout jitted alone (env + policy forward + GAE
             bookkeeping storage)
  iter     - the full jitted training iteration (rollout + GAE + update)

and derives update = iter - rollout. Each timing loops K calls around a
blocking readback (the axon tunnel costs ~20 ms fixed per dispatch;
amortize, never time single calls — docs/PERF_NOTES_3D.md).

Usage:
  python scripts/profile_rl.py [--dim 3] [--envs 256,512,1024] [--k 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=3, choices=(2, 3))
    p.add_argument("--envs", default="256,512,1024")
    p.add_argument("--n_steps", type=int, default=None,
                   help="rollout length (default: 4 in 3D, 64 in 2D)")
    p.add_argument("--k", type=int, default=5, help="timing repetitions")
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rbc_gym_tpu.rl import PPO, PPOConfig
    from rbc_gym_tpu.wrappers import functional as fn

    n_steps = args.n_steps or (4 if args.dim == 3 else 64)

    def build(n_envs):
        if args.dim == 3:
            from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
            from rbc_gym_tpu.models import RBCActorCritic

            env = RBC3DVectorEnv(
                num_envs=n_envs,
                rayleigh_number=2500,
                state_shape=(16, 32, 32),
                heater_duration=0.375,
                episode_length=60,
                dt_solver=0.01,
            )
            model = RBCActorCritic(action_grid=(8, 8))
            norm = fn.make_obs_norm_3d(ra=2500, heater_limit=0.9)
            tr = lambda o: fn.normalize_observation(o, norm, channel_axis=-4)
            actions = jnp.zeros((n_envs, 8, 8), jnp.float32)
        else:
            from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
            from rbc_gym_tpu.models import RBCActorCritic2D

            env = RBC2DVectorEnv(num_envs=n_envs, rayleigh_number=10_000)
            model = RBCActorCritic2D(n_heaters=12)
            norm = fn.make_obs_norm_2d(heater_limit=0.75)
            tr = lambda o: fn.normalize_observation(o, norm, channel_axis=-3)
            actions = jnp.zeros((n_envs, 12), jnp.float32)

        cfg = PPOConfig(
            n_steps=n_steps,
            n_epochs=args.epochs,
            n_minibatches=max(1, (n_steps * n_envs) // 2048),
        )
        return PPO(env, model, cfg, obs_transform=tr, seed=0), actions

    def timed(fn_, *a):
        out = fn_(*a)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.k):
            out = fn_(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.k

    print(f"dim={args.dim} n_steps={n_steps} epochs={args.epochs} "
          f"(k={args.k} reps)")
    print(f"{'envs':>6} {'env ms':>9} {'rollout ms':>11} {'iter ms':>9} "
          f"{'update ms':>10} {'train steps/s':>14} {'env ceiling':>12}")
    for n_envs in [int(x) for x in args.envs.split(",")]:
        trainer, actions = build(n_envs)
        env = trainer.env

        @jax.jit
        def env_loop(state):
            def body(s, _):
                s, ts = env._step(s, actions)
                return s, ts.reward[0]
            s, r = jax.lax.scan(body, state, None, length=n_steps)
            return r.sum()

        @jax.jit
        def rollout_only(ts_, es_, obs_, key_):
            es2, obs2, key2, traj, last = trainer._rollout(ts_, es_, obs_, key_)
            return traj.reward.sum() + last.sum()

        t_env = timed(env_loop, trainer.env_state)
        t_roll = timed(
            rollout_only, trainer.train_state, trainer.env_state,
            trainer.last_obs, trainer.key,
        )

        def iteration():
            out = trainer._iteration(
                trainer.train_state, trainer.env_state, trainer.last_obs,
                trainer.key,
            )
            return out[4]["loss"]

        t_iter = timed(iteration)
        steps = n_steps * n_envs
        print(f"{n_envs:>6} {1e3*t_env:>9.1f} {1e3*t_roll:>11.1f} "
              f"{1e3*t_iter:>9.1f} {1e3*(t_iter-t_roll):>10.1f} "
              f"{steps/t_iter:>14.0f} {steps/t_env:>12.0f}")


if __name__ == "__main__":
    main()
