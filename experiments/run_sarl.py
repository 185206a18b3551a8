#!/usr/bin/env python
"""Single-agent PPO training on the 3D RBC environment (TPU-native).

Mirrors the reference experiments/run_sarl.py CLI surface: a YAML config (or
in-script defaults) with the same keys, an output directory with a frozen
config snapshot, periodic checkpoints, eval with best-model saving, and
optional W&B. The SB3 + SubprocVecEnv machinery (one OS process + embedded
Julia runtime per env) is replaced by the lockstep vector env + jitted PPO —
the rollout never leaves the chip.

Usage:
  python experiments/run_sarl.py --config config.yaml --output_dir results/run1
"""

import argparse
import json
import logging
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("run_sarl")

DEFAULT_CONFIG = {
    # reference defaults (experiments/run_sarl.py:61-92), with n_envs raised
    # because lockstep envs are nearly free compared to subprocesses
    "rl_n_steps": 4,
    "rl_n_envs": 16,
    "rl_batch_size": 16,
    "rl_n_epochs": 10,
    "rl_ent_coef": 0.01,
    "rl_learning_rate": 3e-4,
    "rl_target_kl": 0.02,
    "rl_anneal_lr": False,
    # Reference RBCNormalizeReward semantics; keeps critic return scale
    # O(10) so its gradients don't dwarf the policy's (see run_sarl_2d).
    "rl_normalize_reward": True,
    "rl_stat_window_size": 50,
    "rl_nr_iterations": 10,
    "rbc_heater_duration": 0.375,
    "rbc_heater_limit": 0.9,
    "rbc_rayleigh_number": 2500,
    "rbc_episode_length": 10,
    "rbc_state_shape": [16, 32, 32],
    "rbc_dt_solver": 0.01,
    "rbc_checkpoint": None,  # path to a 3D bank; None = random ICs
    "rbc_checkpoint_idx": None,
    "rl_log_std_init": 0.0,  # reference/SB3 default exploration scale
    # Persisted architecture flag (round-3 advice): separate actor/critic
    # extractors (False) is what learns; True restores reference parity
    # (SB3 share_features_extractor=True, ref experiments/run_sarl.py:160).
    "rl_share_features_extractor": False,
    "seed": 0,
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None)
    datestring = datetime.now().strftime("%Y%m%d_%H%M%S")
    p.add_argument("--output_dir", type=str,
                   default=f"results/run_local_{datestring}")
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--wandb", action="store_true",
                   help="enable W&B logging (requires wandb installed)")
    # Config overrides used by scripts/train_sa.sbatch (take precedence over
    # both the in-script defaults and a --config YAML).
    p.add_argument("--num_envs", type=int, default=None,
                   help="override rl_n_envs")
    p.add_argument("--iterations", type=int, default=None,
                   help="override rl_nr_iterations")
    p.add_argument("--n_steps", type=int, default=None,
                   help="override rl_n_steps")
    p.add_argument("--ra", type=float, default=None,
                   help="override rbc_rayleigh_number")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="override rbc_checkpoint (3D bank path)")
    return p.parse_args()


def main():
    args = parse_args()
    config = dict(DEFAULT_CONFIG)
    # A resumed run MUST rebuild the exact same trainer structure; the
    # frozen snapshot in the output dir is the source of truth there.
    frozen = os.path.join(args.output_dir, "config.yaml")
    if args.resume_training and os.path.isfile(frozen) and args.config is None:
        args.config = frozen
    if args.config and os.path.isfile(args.config):
        import yaml

        with open(args.config) as f:
            config.update(yaml.safe_load(f))
        logger.info("Loaded config from %s", args.config)
    else:
        logger.info("No config file provided; using in-script defaults.")

    overrides = {
        "rl_n_envs": args.num_envs,
        "rl_nr_iterations": args.iterations,
        "rl_n_steps": args.n_steps,
        "rbc_rayleigh_number": args.ra,
        "rbc_checkpoint": args.checkpoint,
    }
    for key, val in overrides.items():
        if val is not None:
            config[key] = val
    # Keep the minibatch divisibility invariant when the buffer is resized
    # via CLI overrides: batch one env-batch worth of timesteps.
    if (args.num_envs is not None or args.n_steps is not None) and (
        (config["rl_n_steps"] * config["rl_n_envs"])
        % config["rl_batch_size"] != 0
    ):
        config["rl_batch_size"] = config["rl_n_envs"]

    rollout_buffer_size = config["rl_n_steps"] * config["rl_n_envs"]
    assert rollout_buffer_size % config["rl_batch_size"] == 0, (
        "rollout_buffer_size must be divisible by batch_size"
    )
    n_minibatches = rollout_buffer_size // config["rl_batch_size"]

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "config.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(config, f)

    # Multi-host: no-op on single-process runs; on a pod/cluster launch
    # (scripts/launch_multihost.sh) this joins the ('host','env') SPMD mesh.
    from rbc_gym_tpu.parallel import (
        initialize_distributed,
        make_host_env_mesh,
        shard_ppo_trainer,
    )

    initialize_distributed()

    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
    from rbc_gym_tpu.models import RBCActorCritic
    from rbc_gym_tpu.rl import (
        PPO,
        PPOConfig,
        CheckpointCallback,
        EvaluationCallback,
        MetricsLogger,
        NusseltCallback,
    )
    from rbc_gym_tpu.wrappers import functional as fn

    env_kwargs = dict(
        rayleigh_number=config["rbc_rayleigh_number"],
        state_shape=tuple(config["rbc_state_shape"]),
        heater_segments=int(config.get("rbc_heater_segments", 8)),
        heater_duration=config["rbc_heater_duration"],
        heater_limit=config["rbc_heater_limit"],
        episode_length=config["rbc_episode_length"],
        dt_solver=config["rbc_dt_solver"],
        checkpoint=config["rbc_checkpoint"],
        checkpoint_idx=config["rbc_checkpoint_idx"],
    )
    env = RBC3DVectorEnv(num_envs=config["rl_n_envs"], **env_kwargs)
    eval_env = RBC3DVectorEnv(num_envs=max(1, config["rl_n_envs"] // 4),
                              **env_kwargs)

    norm = fn.make_obs_norm_3d(
        ra=config["rbc_rayleigh_number"],
        heater_limit=config["rbc_heater_limit"],
    )

    def obs_transform(o):
        return fn.normalize_observation(o, norm, channel_axis=-4)

    reward_transform = None
    if config.get("rl_normalize_reward", False):
        scale = fn.reward_scale(config["rbc_rayleigh_number"], three_d=True)
        reward_transform = lambda r: fn.normalize_reward(r, scale)

    ppo_cfg = PPOConfig(
        n_steps=config["rl_n_steps"],
        n_epochs=config["rl_n_epochs"],
        n_minibatches=n_minibatches,
        ent_coef=config["rl_ent_coef"],
        learning_rate=config["rl_learning_rate"],
        target_kl=config.get("rl_target_kl"),
        anneal_lr=bool(config.get("rl_anneal_lr", False)),
        total_iterations=config["rl_nr_iterations"],
    )
    s = env.params.n_heaters
    trainer = PPO(
        env,
        RBCActorCritic(
            action_grid=(s, s),
            log_std_init=config.get("rl_log_std_init", 0.0),
            share_features_extractor=bool(
                config.get("rl_share_features_extractor", False)
            ),
        ),
        ppo_cfg,
        obs_transform=obs_transform,
        reward_transform=reward_transform,
        seed=config["seed"],
    )
    logger.info(
        "Rollout buffer: %d timesteps per rollout (%d envs x %d steps)",
        rollout_buffer_size, config["rl_n_envs"], config["rl_n_steps"],
    )

    import jax

    if jax.device_count() > 1 and config["rl_n_envs"] % jax.device_count() == 0:
        mesh = make_host_env_mesh()
        trainer = shard_ppo_trainer(trainer, mesh)
        logger.info(
            "Sharded PPO over mesh %s (%d hosts x %d devices)",
            dict(zip(mesh.axis_names, mesh.devices.shape)),
            mesh.devices.shape[0], mesh.devices.shape[1],
        )

    ckpt_dir = os.path.join(args.output_dir, "models", "checkpoints")
    steps_per_ep = env.episode_steps
    # Order matters: callbacks that ADD metrics (Nusselt, Evaluation) must
    # run before the sinks (MetricsLogger, W&B) or eval/* never reaches
    # metrics.jsonl.
    # CheckpointCallback runs LAST so the full-state snapshot captures the
    # other callbacks' post-iteration state (wall-clock offset after any
    # eval compile, best-model scores).
    ckpt_cb = CheckpointCallback(ckpt_dir, save_freq=4)
    metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
    callbacks = [
        NusseltCallback(),
        EvaluationCallback(
            eval_env,
            n_steps=steps_per_ep,
            freq=10,
            save_model=True,
            save_path=os.path.join(args.output_dir, "models"),
            obs_transform=obs_transform,
        ),
        MetricsLogger(metrics_path),
        ckpt_cb,
    ]
    if args.wandb:
        from rbc_gym_tpu.rl import WandbCallback

        callbacks.insert(  # before ckpt_cb, which must stay last
            len(callbacks) - 1,
            WandbCallback(project="rbc-3D-rl", config=config,
                          dir=args.output_dir,
                          model_save_path=os.path.join(args.output_dir,
                                                       "models")),
        )
    callbacks = tuple(callbacks)
    ckpt_cb.sibling_callbacks = callbacks

    start_iteration = 0
    if args.resume_training:
        from rbc_gym_tpu.rl import (
            restore_training_state_with_fallback,
            truncate_metrics_jsonl,
        )

        # Falls back to latest_full.npz.new / previous_full.npz when the
        # primary is missing or corrupt (crash-window recovery).
        start_iteration = restore_training_state_with_fallback(
            ckpt_cb.full_path, trainer, callbacks=callbacks
        )
        kept = truncate_metrics_jsonl(metrics_path, start_iteration - 1)
        logger.info("Resuming at iteration %d (%d metrics records kept)",
                    start_iteration, kept)
        if jax.device_count() > 1 and config["rl_n_envs"] % jax.device_count() == 0:
            # restore loads host numpy arrays — re-lay them out on the mesh
            trainer = shard_ppo_trainer(trainer, make_host_env_mesh())

    metrics = trainer.learn(config["rl_nr_iterations"], callbacks=callbacks,
                            start_iteration=start_iteration)
    logger.info("Final metrics: %s", json.dumps(metrics, indent=2))

    from rbc_gym_tpu.rl import save_params

    save_params(
        trainer.train_state.params,
        os.path.join(args.output_dir, "models", "final_model.msgpack"),
    )


if __name__ == "__main__":
    main()
