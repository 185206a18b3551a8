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

__all__ = [
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
