#!/usr/bin/env python
"""Trained-policy vs zero-action vs random-action Nusselt comparison.

The RL claim of this suite — and of the reference (README.md "suppress
convective heat transport", reward = -Nu, envs/rbc3D.py:234-236) — is that
the learned heater policy reduces the Nusselt number below the uncontrolled
flow. This script quantifies that on a HELD-OUT checkpoint bank: for each
policy in {trained (greedy), zero action, random action} it rolls N
lockstep episodes from the bank and reports mean/std Nusselt over the
episode (and over its second half, where the policy's effect has
accumulated), writing `baseline_eval.json` next to the model.

Works on both run_sarl.py (3D) and run_sarl_2d.py (2D) result dirs — the
env dimensionality is read from the saved config.

Usage:
  python experiments/eval_baselines.py results/sarl_ra2500 \
      [--bank data/checkpoints/test/3D_ckpt_ra2500.h5] [--episodes 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--bank", default=None,
                   help="held-out checkpoint bank for initial conditions "
                        "(default: the test-split twin of the training bank, "
                        "or the Ra-matched test bank)")
    p.add_argument("--episodes", type=int, default=64,
                   help="lockstep episodes per policy")
    p.add_argument("--model", default="models/best_model.msgpack")
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    import yaml
    import numpy as np
    import jax
    import jax.numpy as jnp

    with open(os.path.join(args.result_dir, "config.yaml")) as f:
        config = yaml.safe_load(f)

    from rbc_gym_tpu.rl import load_params
    from rbc_gym_tpu.wrappers import functional as fn

    is_3d = len(config["rbc_state_shape"]) == 3
    ra = int(config["rbc_rayleigh_number"])
    bank = args.bank or (
        f"data/checkpoints/test/3D_ckpt_ra{ra}.h5"
        if is_3d
        else f"data/checkpoints/test/ckpt_ra{ra}.h5"
    )

    env_kwargs = dict(
        num_envs=args.episodes,
        rayleigh_number=config["rbc_rayleigh_number"],
        state_shape=tuple(config["rbc_state_shape"]),
        heater_duration=config["rbc_heater_duration"],
        heater_limit=config["rbc_heater_limit"],
        episode_length=config["rbc_episode_length"],
        checkpoint=bank,
        auto_reset=False,
    )
    if is_3d:
        from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
        from rbc_gym_tpu.models import RBCActorCritic

        env = RBC3DVectorEnv(
            dt_solver=config.get("rbc_dt_solver", 0.01), **env_kwargs
        )
        model = RBCActorCritic(action_grid=(8, 8))
        norm = fn.make_obs_norm_3d(
            ra=config["rbc_rayleigh_number"],
            heater_limit=config["rbc_heater_limit"],
        )
        channel_axis = -4
        a_shape = (args.episodes, 8, 8)

        def nus_of(ts):
            return ts.nusselt
    else:
        from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
        from rbc_gym_tpu.models import RBCActorCritic2D

        env = RBC2DVectorEnv(
            observation_shape=tuple(config["rbc_observation_shape"]),
            **env_kwargs,
        )
        model = RBCActorCritic2D(
            n_heaters=12,
            log_std_init=config.get("rl_log_std_init", 0.0),
        )
        norm = fn.make_obs_norm_2d(heater_limit=config["rbc_heater_limit"])
        channel_axis = -3
        a_shape = (args.episodes, 12)

        def nus_of(ts):
            return ts.nusselt_state

    state0, obs0 = env.reset(jax.random.PRNGKey(args.seed))
    obs_n = fn.normalize_observation(obs0, norm, channel_axis=channel_axis)
    params = model.init(jax.random.PRNGKey(0), obs_n)
    params = load_params(params, os.path.join(args.result_dir, args.model))

    n_steps = env.episode_steps

    def rollout(action_fn):
        def step(carry, key):
            env_state, obs = carry
            action = action_fn(obs, key)
            env_state, ts = env.step(env_state, action)
            return (env_state, ts.obs), nus_of(ts)

        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), n_steps)
        _, nus = jax.lax.scan(step, (state0, obs0), keys)
        return nus  # (n_steps, episodes)

    def trained(obs, key):
        o = fn.normalize_observation(obs, norm, channel_axis=channel_axis)
        mean, _, _ = model.apply(params, o)
        return jnp.clip(mean, -1.0, 1.0)

    def zero(obs, key):
        return jnp.zeros(a_shape, jnp.float32)

    def random(obs, key):
        return jax.random.uniform(key, a_shape, jnp.float32, -1.0, 1.0)

    results = {}
    for name, fn_ in (("trained", trained), ("zero", zero), ("random", random)):
        nus = np.asarray(jax.jit(lambda: rollout(fn_))())
        half = nus[nus.shape[0] // 2:]
        results[name] = {
            "nusselt_mean": float(nus.mean()),
            "nusselt_std_across_episodes": float(nus.mean(axis=0).std()),
            "nusselt_mean_second_half": float(half.mean()),
            "n_steps": int(nus.shape[0]),
            "episodes": int(nus.shape[1]),
        }
        print(f"{name:8}: Nu = {results[name]['nusselt_mean']:.4f} "
              f"(2nd half {results[name]['nusselt_mean_second_half']:.4f})",
              flush=True)

    tr = results["trained"]["nusselt_mean_second_half"]
    z = results["zero"]["nusselt_mean_second_half"]
    results["suppression_vs_zero_pct"] = 100.0 * (z - tr) / z
    results["bank"] = bank
    results["model"] = args.model
    out = os.path.join(args.result_dir, "baseline_eval.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"suppression vs zero-action: "
          f"{results['suppression_vs_zero_pct']:.2f}%  -> {out}")


if __name__ == "__main__":
    main()
