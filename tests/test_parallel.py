"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
from rbc_gym_tpu.parallel import make_env_mesh, shard_batch, shard_vector_env

CFG = dict(
    state_shape=(16, 32),
    observation_shape=(8, 16),
    heater_duration=0.3,
    episode_length=3.0,
)


def test_mesh_construction():
    mesh = make_env_mesh(8)
    assert mesh.shape == {"dp": 2, "env": 4}
    mesh = make_env_mesh(8, dp=4)
    assert mesh.shape == {"dp": 4, "env": 2}


def test_sharded_env_step_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_env_mesh(8)
    env = RBC2DVectorEnv(num_envs=16, **CFG)
    sharded = shard_vector_env(env, mesh)

    key = jax.random.PRNGKey(0)
    s0, o0 = env.reset(key)
    s1, o1 = sharded.reset(key)
    actions = jnp.zeros((16, 12))
    s0, ts0 = env.step(s0, actions)
    s1, ts1 = sharded.step(s1, actions)

    # sharded step really is distributed
    shards = s1.fields.b.sharding
    assert len(shards.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(ts0.reward), np.asarray(ts1.reward), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ts0.obs), np.asarray(ts1.obs), rtol=1e-4, atol=1e-5
    )


def test_initialize_distributed_noop_single_process():
    from rbc_gym_tpu.parallel import initialize_distributed

    # single process, no coordinator configured -> must be a no-op
    assert initialize_distributed() is False


def test_host_env_mesh_single_process():
    from rbc_gym_tpu.parallel import make_host_env_mesh, host_local_slice

    mesh = make_host_env_mesh()
    assert mesh.axis_names == ("host", "env")
    assert mesh.devices.shape == (1, len(jax.devices()))
    mesh4 = make_host_env_mesh(n_devices=4)
    assert mesh4.devices.shape == (1, 4)
    assert host_local_slice(16) == slice(0, 16)


def test_shard_ppo_trainer_host_env_mesh():
    """shard_ppo_trainer: env batch sharded over the mesh, params
    replicated, and one training iteration runs SPMD to a finite loss."""
    from rbc_gym_tpu.models import RBCActorCritic
    from rbc_gym_tpu.rl import PPO, PPOConfig
    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
    from rbc_gym_tpu.parallel import make_host_env_mesh, shard_ppo_trainer

    mesh = make_host_env_mesh()
    env = RBC3DVectorEnv(
        num_envs=8,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        episode_length=0.5,  # truncation (and autoreset) inside the rollout
        rayleigh_number=2500,
    )
    trainer = PPO(
        env,
        RBCActorCritic(),
        PPOConfig(n_steps=2, n_epochs=1, n_minibatches=1),
        seed=0,
    )
    trainer = shard_ppo_trainer(trainer, mesh)
    assert len(trainer.env_state.fields.b.sharding.device_set) == 8
    assert len(
        trainer.train_state.params["params"]["log_std"].sharding.device_set
    ) == 8  # replicated over all devices
    metrics = trainer.learn(1)
    assert np.isfinite(metrics["loss"])


def test_sharded_ppo_iteration():
    """Full PPO train step with sharded env batch + replicated params."""
    from rbc_gym_tpu.models import RBCActorCritic
    from rbc_gym_tpu.rl import PPO, PPOConfig
    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    mesh = make_env_mesh(8)
    env = RBC3DVectorEnv(
        num_envs=8,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        episode_length=1,
        rayleigh_number=2500,
    )
    sharded = shard_vector_env(env, mesh)
    trainer = PPO(
        sharded,
        RBCActorCritic(),
        PPOConfig(n_steps=2, n_epochs=1, n_minibatches=2),
        seed=0,
    )
    metrics = trainer.learn(1)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["rollout/nusselt_mean"])
