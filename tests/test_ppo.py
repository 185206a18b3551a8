"""PPO training-loop tests on tiny envs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv
from rbc_gym_tpu.models import RBCActorCritic
from rbc_gym_tpu.rl import (
    PPO,
    PPOConfig,
    CheckpointCallback,
    EvaluationCallback,
    MetricsLogger,
    NusseltCallback,
    load_params,
    save_params,
)
from rbc_gym_tpu.wrappers import functional as fn


def _make_trainer(tmp_path=None, n_envs=2, n_steps=4):
    env = RBC3DVectorEnv(
        num_envs=n_envs,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        episode_length=2,  # 4 steps/episode
        rayleigh_number=2500,
    )
    norm = fn.make_obs_norm_3d(ra=2500, heater_limit=0.9)
    cfg = PPOConfig(n_steps=n_steps, n_epochs=2, n_minibatches=2)
    model = RBCActorCritic(action_grid=(8, 8))
    return PPO(
        env,
        model,
        cfg,
        obs_transform=lambda o: fn.normalize_observation(o, norm, channel_axis=-4),
        seed=0,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ppo")
    trainer = _make_trainer()
    nusselt_cb = NusseltCallback()
    ckpt_cb = CheckpointCallback(str(tmp / "ckpts"), save_freq=1)
    logger_cb = MetricsLogger(str(tmp / "metrics.jsonl"))
    metrics = trainer.learn(2, callbacks=(nusselt_cb, ckpt_cb, logger_cb))
    return trainer, metrics, nusselt_cb, tmp


def test_training_runs_and_metrics(trained):
    trainer, metrics, nusselt_cb, tmp = trained
    for k in (
        "loss",
        "policy_loss",
        "value_loss",
        "entropy",
        "approx_kl",
        "rollout/nusselt_mean",
        "rollout/reward_mean",
    ):
        assert k in metrics and np.isfinite(metrics[k]), k
    assert metrics["global_step"] == 2 * 4 * 2  # iters * n_steps * n_envs
    assert nusselt_cb.best_nusselt <= metrics["rollout/nusselt_mean"] + 1e-6


def test_params_update_and_finite(trained):
    trainer, *_ = trained
    leaves = jax.tree_util.tree_leaves(trainer.train_state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert int(trainer.train_state.step) == 2 * 2 * 2  # iters*epochs*minibatches


def test_checkpoint_roundtrip(trained):
    trainer, _, _, tmp = trained
    all_files = sorted(os.listdir(tmp / "ckpts"))
    files = [f for f in all_files if f.endswith(".msgpack")]
    assert files, "no checkpoints written"
    # the resumable full-state snapshot rides alongside the params-only
    # msgpack files (rl/checkpoint.py)
    assert "latest_full.npz" in all_files
    restored = load_params(
        trainer.train_state.params, str(tmp / "ckpts" / files[0])
    )
    # same pytree structure
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(
        trainer.train_state.params
    )


def test_metrics_jsonl(trained):
    _, _, _, tmp = trained
    lines = open(tmp / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2


def test_predict_deterministic(trained):
    trainer, *_ = trained
    obs = trainer.last_obs
    a1 = trainer.predict(obs, deterministic=True)
    a2 = trainer.predict(obs, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (2, 8, 8)
    assert np.all(np.abs(np.asarray(a1)) <= 1.0)


def test_gae_matches_explicit_loop(trained):
    """The stitched-bootstrap GAE (next step's stored value + boundary
    forwards) must equal an explicit per-step next_value loop — the round-1
    implementation paid a full V(final_obs) forward every step for this."""
    trainer, *_ = trained
    cfg = trainer.config
    T, E = 6, 3
    rng = np.random.default_rng(0)
    value = rng.normal(size=(T, E)).astype(np.float32)
    reward = rng.normal(size=(T, E)).astype(np.float32)
    boundary = rng.normal(size=(T, E)).astype(np.float32)
    truncated = np.zeros((T, E), bool)
    truncated[2] = True  # lockstep truncation mid-rollout
    last_value = rng.normal(size=(E,)).astype(np.float32)

    from rbc_gym_tpu.rl.ppo import Transition

    traj = Transition(
        obs=None, action=None, log_prob=None,
        value=jnp.asarray(value), reward=jnp.asarray(reward),
        truncated=jnp.asarray(truncated),
        boundary_value=jnp.asarray(boundary), nusselt=None,
    )
    adv, ret = trainer._gae(traj, jnp.asarray(last_value))

    # explicit reference: old semantics with per-step next_value arrays
    next_value = np.concatenate([value[1:], last_value[None]], axis=0)
    next_value = np.where(truncated, boundary, next_value)
    ref_adv = np.zeros((T, E), np.float32)
    carry = np.zeros(E, np.float32)
    for t in reversed(range(T)):
        delta = reward[t] + cfg.gamma * next_value[t] - value[t]
        carry = delta + cfg.gamma * cfg.gae_lambda * np.where(
            truncated[t], 0.0, carry
        )
        ref_adv[t] = carry
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ret), ref_adv + value, rtol=1e-5, atol=1e-6
    )


def test_target_kl_stops_updates():
    """SB3 target_kl semantics: the first minibatch always applies (its
    ratio is exactly 1 -> KL 0), and once any minibatch's KL exceeds
    1.5*target_kl every later update this iteration is skipped. With a
    vanishingly small target_kl exactly ONE update applies per iteration."""
    env = RBC3DVectorEnv(
        num_envs=2,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        episode_length=2,
        rayleigh_number=2500,
    )
    model = RBCActorCritic(action_grid=(8, 8))

    def make(target_kl):
        cfg = PPOConfig(
            n_steps=4, n_epochs=2, n_minibatches=2, target_kl=target_kl
        )
        return PPO(env, model, cfg, seed=0)

    tiny = make(1e-12)
    metrics = tiny.learn(2)
    assert metrics["n_updates"] == 1.0
    assert int(tiny.train_state.step) == 2  # one applied update per iter

    huge = make(10.0)
    metrics = huge.learn(1)
    assert metrics["n_updates"] == 2 * 2  # epochs * minibatches
    assert int(huge.train_state.step) == 4


def test_iteration_compiles_once():
    """The jitted training iteration must not retrace after the first
    call. Historical offenders: TrainState.create's python-int step and
    the weak-typed jnp.full log_std init, each of which changed input
    avals after one update and silently doubled the multi-minute compile."""
    env = RBC3DVectorEnv(
        num_envs=2, state_shape=(16, 32, 32), heater_duration=0.125,
        episode_length=2, rayleigh_number=2500,
    )
    tr = PPO(
        env,
        RBCActorCritic(action_grid=(8, 8)),
        PPOConfig(n_steps=2, n_epochs=1, n_minibatches=1),
        seed=0,
    )
    tr.learn(3)
    assert tr._iteration._cache_size() == 1


def test_anneal_lr_requires_total_iterations():
    env = RBC3DVectorEnv(
        num_envs=2, state_shape=(16, 32, 32), heater_duration=0.125,
        episode_length=2, rayleigh_number=2500,
    )
    with pytest.raises(ValueError, match="total_iterations"):
        PPO(
            env,
            RBCActorCritic(action_grid=(8, 8)),
            PPOConfig(n_steps=2, n_epochs=1, n_minibatches=1, anneal_lr=True),
        )


def test_final_obs_equals_obs_when_not_truncated():
    """Property the GAE stitching relies on: on non-truncating steps the
    env's obs and final_obs are bit-identical."""
    env = RBC3DVectorEnv(
        num_envs=2,
        state_shape=(8, 16, 16),
        heater_duration=0.125,
        episode_length=1,  # 2 steps/episode
        rayleigh_number=2500,
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.zeros((2, 8, 8)))
    assert not bool(ts.truncated.any())
    np.testing.assert_array_equal(np.asarray(ts.obs), np.asarray(ts.final_obs))
    state, ts = env.step(state, jnp.zeros((2, 8, 8)))
    assert bool(ts.truncated.all())
    assert not np.array_equal(np.asarray(ts.obs), np.asarray(ts.final_obs))


def test_evaluation_callback(trained):
    trainer, *_ , tmp = trained
    eval_env = RBC3DVectorEnv(
        num_envs=1,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        episode_length=1,
        rayleigh_number=2500,
    )
    norm = fn.make_obs_norm_3d(ra=2500, heater_limit=0.9)
    cb = EvaluationCallback(
        eval_env, n_steps=2, save_model=True, save_path=str(tmp / "best"),
        obs_transform=lambda o: fn.normalize_observation(o, norm, channel_axis=-4),
    )
    metrics = {"iteration": 0, "global_step": 0}
    cb(metrics, trainer)
    assert "eval/reward" in metrics and np.isfinite(metrics["eval/reward"])
    assert os.path.exists(tmp / "best" / "best_model.msgpack")
