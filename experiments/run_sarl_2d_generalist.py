"""Multi-Ra generalist 2D PPO: ONE policy trained across the bank ladder.

The reference frames the 2D task as a Ra-parameterized family (its
wrappers take Ra: reference src/rbc_gym/wrappers/rbc_normalize_reward.py:
13-25, and its checkpoint ladder spans Ra=1e4..1e7,
scripts/create_checkpoints_2D.sh:18-20) but only ever trains one Ra per
run. This script trains a single policy on a MIX of rungs by round-robin
rollouts: K vector envs (one per Ra, each with its own Ra-correct
obs/reward normalization), one shared TrainState — iteration i collects
its rollout from env i % K and applies the PPO update to the shared
parameters. Evaluation: per-rung result dirs are emitted so
``experiments/eval_baselines.py`` scores the generalist on each held-out
bank exactly like the specialists.

Usage:
  python experiments/run_sarl_2d_generalist.py \
      --ras 10000 30000 100000 1000000 --iterations 800 \
      --output_dir results/sarl2d_generalist
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("run_sarl_2d_generalist")

BASE = dict(
    rl_n_steps=64,
    rl_n_envs=256,
    rl_batch_size=2048,
    rl_n_epochs=10,
    rl_ent_coef=0.01,
    rl_learning_rate=3.0e-4,
    rl_target_kl=0.02,
    rl_anneal_lr=True,
    rl_normalize_reward=True,
    rl_log_std_init=-0.5,
    rbc_heater_duration=1.5,
    rbc_heater_segments=12,
    rbc_heater_limit=0.75,
    rbc_episode_length=300,
    rbc_observation_shape=[8, 48],
    rbc_state_shape=[64, 96],
    seed=0,
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ras", type=int, nargs="+",
                   default=[10_000, 30_000, 100_000, 1_000_000])
    p.add_argument("--iterations", type=int, default=800)
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--n_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--output_dir", default="results/sarl2d_generalist")
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import yaml

    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
    from rbc_gym_tpu.models import RBCActorCritic2D
    from rbc_gym_tpu.rl import PPO, PPOConfig, save_params
    from rbc_gym_tpu.wrappers import functional as fn

    cfg = dict(BASE, rl_n_envs=args.num_envs,
               rl_nr_iterations=args.iterations, rbc_ras=args.ras)
    if args.n_steps:
        cfg["rl_n_steps"] = args.n_steps
    if args.batch_size:
        cfg["rl_batch_size"] = args.batch_size
    with open(os.path.join(args.output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    buffer = cfg["rl_n_steps"] * cfg["rl_n_envs"]
    n_minibatches = buffer // cfg["rl_batch_size"]

    norm = fn.make_obs_norm_2d(heater_limit=cfg["rbc_heater_limit"])

    def obs_transform(o):
        return fn.normalize_observation(o, norm, channel_axis=-3)

    model = RBCActorCritic2D(
        n_heaters=cfg["rbc_heater_segments"],
        log_std_init=cfg["rl_log_std_init"],
    )
    ppo_cfg = PPOConfig(
        n_steps=cfg["rl_n_steps"],
        n_epochs=cfg["rl_n_epochs"],
        n_minibatches=n_minibatches,
        ent_coef=cfg["rl_ent_coef"],
        learning_rate=cfg["rl_learning_rate"],
        target_kl=cfg["rl_target_kl"],
        anneal_lr=True,
        total_iterations=args.iterations,
    )

    trainers = []
    for i, ra in enumerate(args.ras):
        env = RBC2DVectorEnv(
            num_envs=cfg["rl_n_envs"],
            rayleigh_number=ra,
            observation_shape=tuple(cfg["rbc_observation_shape"]),
            state_shape=tuple(cfg["rbc_state_shape"]),
            heater_duration=cfg["rbc_heater_duration"],
            heater_segments=cfg["rbc_heater_segments"],
            heater_limit=cfg["rbc_heater_limit"],
            episode_length=cfg["rbc_episode_length"],
            checkpoint=f"data/checkpoints/train/ckpt_ra{ra}.h5",
        )
        scale = fn.reward_scale(float(ra), three_d=False)
        trainers.append(
            PPO(env, model, ppo_cfg, obs_transform=obs_transform,
                reward_transform=(lambda r, s=scale:
                                  fn.normalize_reward(r, s)),
                seed=cfg["seed"] + i)
        )
    logger.info("Generalist over Ra=%s: %d iterations round-robin "
                "(%d per rung)", args.ras, args.iterations,
                args.iterations // len(args.ras))

    # One shared TrainState (all trainers built the same model/optimizer;
    # trainer 0's is the canonical copy).
    shared = trainers[0].train_state
    metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
    t0 = time.time()
    global_step = 0
    with open(metrics_path, "a") as mf:
        for it in range(args.iterations):
            tr = trainers[it % len(args.ras)]
            shared, tr.env_state, tr.last_obs, tr.key, metrics = (
                tr._iteration(shared, tr.env_state, tr.last_obs, tr.key)
            )
            global_step += cfg["rl_n_steps"] * cfg["rl_n_envs"]
            rec = {k: float(v) for k, v in metrics.items()}
            rec.update(iteration=it, global_step=global_step,
                       ra=args.ras[it % len(args.ras)],
                       wall_time=round(time.time() - t0, 2))
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
            if it % 20 == 0:
                logger.info("iter %d (Ra=%d) nusselt %.3f", it, rec["ra"],
                            rec["rollout/nusselt_mean"])

    for tr in trainers:
        tr.train_state = shared
    save_params(shared.params,
                os.path.join(args.output_dir, "models", "final_model.msgpack"))
    # Per-rung eval dirs: a config.yaml naming that rung + the shared
    # model, consumable by experiments/eval_baselines.py unchanged.
    for ra in args.ras:
        d = os.path.join(args.output_dir, f"ra{ra}")
        os.makedirs(os.path.join(d, "models"), exist_ok=True)
        rung_cfg = {
            k: v for k, v in cfg.items() if k != "rbc_ras"
        }
        rung_cfg["rbc_rayleigh_number"] = ra
        rung_cfg["rbc_checkpoint"] = f"data/checkpoints/train/ckpt_ra{ra}.h5"
        with open(os.path.join(d, "config.yaml"), "w") as f:
            yaml.safe_dump(rung_cfg, f)
        save_params(shared.params,
                    os.path.join(d, "models", "best_model.msgpack"))
    logger.info("Done: %s", args.output_dir)


if __name__ == "__main__":
    main()
