"""On-device RL: PPO + callbacks (replaces SB3 + SubprocVecEnv)."""

from rbc_gym_tpu.rl.ppo import PPO, PPOConfig, Transition
from rbc_gym_tpu.rl.callbacks import (
    CheckpointCallback,
    EvaluationCallback,
    MetricsLogger,
    NusseltCallback,
    WandbCallback,
    load_params,
    save_params,
)
from rbc_gym_tpu.rl.checkpoint import (
    restore_training_state,
    restore_training_state_with_fallback,
    save_training_state,
    truncate_metrics_jsonl,
)

__all__ = [
    "restore_training_state",
    "restore_training_state_with_fallback",
    "save_training_state",
    "truncate_metrics_jsonl",
    "PPO",
    "PPOConfig",
    "Transition",
    "CheckpointCallback",
    "EvaluationCallback",
    "MetricsLogger",
    "NusseltCallback",
    "WandbCallback",
    "load_params",
    "save_params",
]
