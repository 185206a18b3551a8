"""End-to-end native training demo: PPO on the 3D env, all on one chip.

No reference counterpart — this replaces the reference's SB3 workflow
(experiments/run_sarl.py) with ~20 lines. See experiments/run_sarl.py here
for the full-featured CLI."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
from rbc_gym_tpu.models import RBCActorCritic
from rbc_gym_tpu.rl import PPO, PPOConfig, MetricsLogger, NusseltCallback
from rbc_gym_tpu.wrappers import functional as fn

env = RBC3DVectorEnv(num_envs=16, rayleigh_number=2500, episode_length=6)
norm = fn.make_obs_norm_3d(ra=2500, heater_limit=0.9)
trainer = PPO(
    env,
    RBCActorCritic(),
    PPOConfig(n_steps=8, n_epochs=4, n_minibatches=4),
    obs_transform=lambda o: fn.normalize_observation(o, norm, channel_axis=-4),
)
nusselt = NusseltCallback()
trainer.learn(10, callbacks=(nusselt, MetricsLogger(echo_every=1)))
print("best rollout nusselt:", nusselt.best_nusselt)
