#!/usr/bin/env python
"""Trained-policy vs baseline Nusselt comparison with bootstrap CIs.

The RL claim of this suite — and of the reference (README.md "suppress
convective heat transport", reward = -Nu, envs/rbc3D.py:234-236) — is that
the learned heater policy reduces the Nusselt number below the uncontrolled
flow. This script quantifies that on a HELD-OUT checkpoint bank with a
protocol a skeptic can audit:

* initial conditions are drawn WITHOUT replacement from the bank
  (bank_sampling="sequential"); when more episodes than bank states are
  requested, a small thermal kick (--ic_noise) decorrelates the extra
  trajectories and the IC multiplicity is reported in the output;
* every policy rolls from the SAME initial states, so policy contrasts are
  paired per episode;
* the horizon is a flag (--n_steps, default: one full episode) — long
  enough for the actuation to act, unlike a 7-step episode at
  heater_duration 0.375 t_ff;
* the headline number, suppression_vs_zero_pct, carries a paired-bootstrap
  95% CI over episodes;
* a hand-crafted proportional controller (scripts/probe_control2d.py) is
  included as a known-physics baseline alongside {trained, zero, random};
* per-step mean Nu(t) traces per policy are stored for plotting
  (experiments/plot_training.py --eval).

Works on both run_sarl.py (3D) and run_sarl_2d.py (2D) result dirs — the
env dimensionality is read from the saved config.

Usage:
  python experiments/eval_baselines.py results/sarl_ra2500 \
      [--bank data/checkpoints/test/3D_ckpt_ra2500.h5] [--episodes 64] \
      [--n_steps 200] [--ic_noise 1e-3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bootstrap_ci(stat_fn, data, n_boot=10_000, alpha=0.05, seed=0,
                 clusters=None):
    """Percentile bootstrap CI for stat_fn over episode-axis resamples.

    ``data`` is a tuple of arrays whose FIRST axis is episodes; resampling
    is paired (the same episode indices are used for every array).

    ``clusters`` (optional, (episodes,) int array): episodes sharing a
    bank initial condition are only decorrelated by the small ic_noise
    kick, so treating them as independent would make the CI
    anti-conservative. When given, the bootstrap resamples CLUSTERS with
    replacement and keeps each sampled cluster's episodes together
    (cluster/block bootstrap). Degenerate resamples (stat_fn returns
    NaN, e.g. a zero denominator) are excluded via nanquantile.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = data[0].shape[0]
    if clusters is not None and len(np.unique(clusters)) < n:
        groups = [np.where(clusters == c)[0] for c in np.unique(clusters)]
        m = len(groups)
        stats = np.empty(n_boot)
        for i in range(n_boot):
            gidx = rng.integers(0, m, size=m)
            idx = np.concatenate([groups[g] for g in gidx])
            stats[i] = stat_fn(*(d[idx] for d in data))
    else:
        stats = np.empty(n_boot)
        for i in range(n_boot):
            idx = rng.integers(0, n, size=n)
            stats[i] = stat_fn(*(d[idx] for d in data))
    lo, hi = np.nanquantile(stats, [alpha / 2, 1 - alpha / 2])
    return float(lo), float(hi)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--bank", default=None,
                   help="held-out checkpoint bank for initial conditions "
                        "(default: the test-split twin of the training bank, "
                        "or the Ra-matched test bank)")
    p.add_argument("--episodes", type=int, default=64,
                   help="lockstep episodes per policy")
    p.add_argument("--n_steps", type=int, default=None,
                   help="rollout horizon in env steps (default: one episode)")
    p.add_argument("--ic_noise", type=float, default=1e-3,
                   help="thermal kick decorrelating episodes that share a "
                        "bank state (0 disables)")
    p.add_argument("--model", default="models/best_model.msgpack")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--prop_gain", type=float, default=None,
                   help="gain of the proportional-control baseline "
                        "(default: 10.0 in 2D, 0.3 in 3D) — tune per Ra "
                        "with scripts/probe_control{2d,3d}.py so the "
                        "baseline is the BEST linear law, not a stale one")
    p.add_argument("--prop_row", type=int, default=1,
                   help="observation z-row the proportional law senses")
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
        bank_sampling="sequential",
        ic_noise=args.ic_noise,
    )
    if is_3d:
        from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
        from rbc_gym_tpu.models import RBCActorCritic

        s = int(config.get("rbc_heater_segments", 8))
        env = RBC3DVectorEnv(
            dt_solver=config.get("rbc_dt_solver", 0.01),
            heater_segments=s,
            **env_kwargs,
        )
        # reconstruct the exact trained architecture (the trunk flag is
        # persisted in config.yaml by run_sarl.py — round-3 advice)
        model = RBCActorCritic(
            action_grid=(s, s),
            share_features_extractor=bool(
                config.get("rl_share_features_extractor", False)
            ),
        )
        norm = fn.make_obs_norm_3d(
            ra=config["rbc_rayleigh_number"],
            heater_limit=config["rbc_heater_limit"],
        )
        channel_axis = -4
        a_shape = (args.episodes, s, s)
        prop_gain = args.prop_gain if args.prop_gain is not None else 0.3

        def nus_of(ts):
            return ts.nusselt

        ny, nx = env.grid.ny, env.grid.nx
        py, px = ny // s, nx // s

        def proportional(obs, key):
            # Oppose the tile-averaged near-bottom temperature fluctuation
            # (scripts/probe_control3d.py).
            t = obs[:, 0, args.prop_row]  # (E, ny, nx)
            tiles = t.reshape(t.shape[0], s, py, s, px).mean(axis=(2, 4))
            fluct = tiles - tiles.mean(axis=(-2, -1), keepdims=True)
            return jnp.clip(-prop_gain * fluct, -1.0, 1.0)
    else:
        from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
        from rbc_gym_tpu.models import RBCActorCritic2D

        s = int(config.get("rbc_heater_segments", 12))
        env = RBC2DVectorEnv(
            observation_shape=tuple(config["rbc_observation_shape"]),
            heater_segments=s,
            **env_kwargs,
        )
        model = RBCActorCritic2D(
            n_heaters=s,
            log_std_init=config.get("rl_log_std_init", 0.0),
            shared_trunk=bool(config.get("rl_shared_trunk", False)),
        )
        norm = fn.make_obs_norm_2d(heater_limit=config["rbc_heater_limit"])
        channel_axis = -3
        a_shape = (args.episodes, s)
        prop_gain = args.prop_gain if args.prop_gain is not None else 10.0
        nx_o = env.observation_shape[1]
        per_seg = nx_o // s

        def nus_of(ts):
            return ts.nusselt_state

        def proportional(obs, key):
            # Oppose the segment-averaged near-bottom temperature
            # fluctuation (scripts/probe_control2d.py: row 1, gain 10 gives
            # ~+11% suppression at Ra 1e4).
            t_row = obs[:, 0, args.prop_row, :]  # (E, nx_obs)
            t_seg = t_row.reshape(t_row.shape[0], s, per_seg).mean(-1)
            fluct = t_seg - t_seg.mean(axis=-1, keepdims=True)
            return jnp.clip(-prop_gain * fluct, -1.0, 1.0)

    bank_size = int(env._bank.b.shape[0])
    # sequential sampling: episode i starts from bank state i % bank_size,
    # so wrapped episodes cluster on their shared IC for the bootstrap
    ic_clusters = np.arange(args.episodes) % bank_size
    state0, obs0 = env.reset(jax.random.PRNGKey(args.seed))
    obs_n = fn.normalize_observation(obs0, norm, channel_axis=channel_axis)
    params = model.init(jax.random.PRNGKey(0), obs_n)
    params = load_params(params, os.path.join(args.result_dir, args.model))

    n_steps = args.n_steps or env.episode_steps

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

    policies = (
        ("trained", trained),
        ("zero", zero),
        ("random", random),
        ("proportional", proportional),
    )
    results = {}
    per_episode = {}  # policy -> (episodes,) second-half mean Nu
    for name, fn_ in policies:
        nus = np.asarray(jax.jit(lambda: rollout(fn_))())
        half = nus[nus.shape[0] // 2:]
        ep = half.mean(axis=0)  # (episodes,) paired by initial condition
        per_episode[name] = ep
        lo, hi = bootstrap_ci(lambda e: e.mean(), (ep,), clusters=ic_clusters)
        results[name] = {
            "nusselt_mean": float(nus.mean()),
            "nusselt_std_across_episodes": float(nus.mean(axis=0).std()),
            "nusselt_mean_second_half": float(ep.mean()),
            "nusselt_second_half_ci95": [lo, hi],
            "nusselt_trace": [float(v) for v in nus.mean(axis=1)],
            "n_steps": int(nus.shape[0]),
            "episodes": int(nus.shape[1]),
        }
        print(f"{name:12}: Nu = {results[name]['nusselt_mean']:.4f} "
              f"(2nd half {ep.mean():.4f} [{lo:.4f}, {hi:.4f}])",
              flush=True)

    def suppression(name):
        """Paired suppression % with bootstrap CI; None if degenerate."""
        t, z = per_episode[name], per_episode["zero"]
        denom = z.mean()
        if not np.isfinite(denom) or abs(denom) < 1e-9:
            return None
        point = 100.0 * (denom - t.mean()) / denom

        def stat(te, ze):
            zm = ze.mean()
            if not np.isfinite(zm) or abs(zm) < 1e-9:
                return np.nan  # degenerate resample; nanquantile drops it
            return 100.0 * (zm - te.mean()) / zm

        lo, hi = bootstrap_ci(stat, (t, z), clusters=ic_clusters)
        return {"pct": float(point), "ci95": [lo, hi]}

    supp = suppression("trained")
    results["suppression_vs_zero_pct"] = supp["pct"] if supp else None
    results["suppression_vs_zero_ci95"] = supp["ci95"] if supp else None
    for name in ("random", "proportional"):
        sp = suppression(name)
        results[f"suppression_{name}_vs_zero"] = sp
    results["bank"] = bank
    results["bank_size"] = bank_size
    results["prop_gain"] = prop_gain
    results["prop_row"] = args.prop_row
    results["ic_duplication"] = -(-args.episodes // bank_size)  # ceil
    results["ic_noise"] = args.ic_noise
    results["model"] = args.model
    out = os.path.join(args.result_dir, "baseline_eval.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    if supp:
        print(f"suppression vs zero-action: {supp['pct']:.2f}% "
              f"[{supp['ci95'][0]:.2f}, {supp['ci95'][1]:.2f}]  -> {out}")
    else:
        print(f"suppression vs zero-action: undefined "
              f"(degenerate zero baseline)  -> {out}")


if __name__ == "__main__":
    main()
