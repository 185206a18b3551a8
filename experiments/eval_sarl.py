#!/usr/bin/env python
"""Evaluate a trained policy (reference experiments/eval_sarl.py parity):
load config.yaml + best_model from a result dir, run a deterministic
rollout, report per-step Nusselt, optionally save rendered frames.

Usage:
  python experiments/eval_sarl.py results/run_local_xxx [--episodes 1] [--render out/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--episodes", type=int, default=1)
    p.add_argument("--render", type=str, default=None,
                   help="directory to write rendered frames to")
    p.add_argument("--model", default="models/best_model.msgpack")
    args = p.parse_args()

    import yaml
    import numpy as np
    import jax
    import jax.numpy as jnp

    with open(os.path.join(args.result_dir, "config.yaml")) as f:
        config = yaml.safe_load(f)

    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
    from rbc_gym_tpu.models import RBCActorCritic
    from rbc_gym_tpu.rl import load_params
    from rbc_gym_tpu.wrappers import functional as fn
    from rbc_gym_tpu.envs.rendering import render_volume_slices

    env = RBC3DVectorEnv(
        num_envs=1,
        rayleigh_number=config["rbc_rayleigh_number"],
        state_shape=tuple(config["rbc_state_shape"]),
        heater_duration=config["rbc_heater_duration"],
        heater_segments=int(config.get("rbc_heater_segments", 8)),
        heater_limit=config["rbc_heater_limit"],
        episode_length=config["rbc_episode_length"],
        dt_solver=config.get("rbc_dt_solver", 0.01),
        checkpoint=config.get("rbc_checkpoint"),
        checkpoint_idx=config.get("rbc_checkpoint_idx"),
        auto_reset=False,
    )
    norm = fn.make_obs_norm_3d(
        ra=config["rbc_rayleigh_number"],
        heater_limit=config["rbc_heater_limit"],
    )

    # reconstruct the exact trained architecture from the frozen config
    # (trunk flag + heater grid — round-3 advice, as in eval_baselines)
    s = int(config.get("rbc_heater_segments", 8))
    model = RBCActorCritic(
        action_grid=(s, s),
        share_features_extractor=bool(
            config.get("rl_share_features_extractor", False)
        ),
    )
    state, obs = env.reset(jax.random.PRNGKey(config.get("seed", 0)))
    obs_n = fn.normalize_observation(obs, norm, channel_axis=-4)
    params = model.init(jax.random.PRNGKey(0), obs_n)
    params = load_params(params, os.path.join(args.result_dir, args.model))

    @jax.jit
    def policy(params, obs):
        mean, _, _ = model.apply(params, obs)
        return jnp.clip(mean, -1.0, 1.0)

    if args.render:
        os.makedirs(args.render, exist_ok=True)

    for ep in range(args.episodes):
        nus = []
        for step in range(env.episode_steps):
            action = policy(
                params, fn.normalize_observation(obs, norm, channel_axis=-4)
            )
            state, ts = env.step(state, action)
            obs = ts.obs
            nus.append(float(ts.nusselt[0]))
            if args.render:
                t_field = np.asarray(ts.obs[0, 0])  # (nz, ny, nx)
                img = render_volume_slices(np.flip(t_field, 1), 1.0, 2.0)
                try:
                    import imageio

                    imageio.imwrite(
                        os.path.join(args.render, f"ep{ep}_s{step:04d}.png"),
                        img,
                    )
                except ImportError:
                    np.save(
                        os.path.join(args.render, f"ep{ep}_s{step:04d}.npy"),
                        img,
                    )
        print(
            f"episode {ep}: mean Nu {np.mean(nus):.4f} "
            f"min {np.min(nus):.4f} max {np.max(nus):.4f}"
        )
        if ep + 1 < args.episodes:
            state, obs = env.reset(jax.random.PRNGKey(ep + 1))


if __name__ == "__main__":
    main()
