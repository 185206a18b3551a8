"""Native JAX vector env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv, RBC2DGymVectorEnv

CFG = dict(
    state_shape=(16, 32),
    observation_shape=(8, 16),
    heater_duration=0.3,
    episode_length=0.9,  # 3 steps per episode
)


def test_vector_env_shapes_and_autoreset():
    env = RBC2DVectorEnv(num_envs=4, **CFG)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 3, 8, 16)

    actions = jnp.zeros((4, 12))
    for i in range(3):
        state, ts = env.step(state, actions)
    assert bool(ts.truncated.all())  # all envs truncate at step 3
    # autoreset: episode bookkeeping reset
    assert np.all(np.asarray(state.t) == 0.0)
    assert np.all(np.asarray(state.step) == 1)

    state, ts = env.step(state, actions)
    assert not bool(ts.truncated.any())
    assert np.all(np.asarray(ts.t) == pytest.approx(0.3))


def test_vector_env_reward_matches_nusselt():
    env = RBC2DVectorEnv(num_envs=2, **CFG)
    state, _ = env.reset(jax.random.PRNGKey(1))
    state, ts = env.step(state, jnp.zeros((2, 12)))
    np.testing.assert_allclose(
        np.asarray(ts.reward), -np.asarray(ts.nusselt_obs), rtol=1e-6
    )


def test_vector_envs_independent_streams():
    """Different envs in the batch must receive different initial states."""
    env = RBC2DVectorEnv(num_envs=3, **CFG)
    state, obs = env.reset(jax.random.PRNGKey(2))
    o = np.asarray(obs)
    assert not np.array_equal(o[0], o[1])
    assert not np.array_equal(o[1], o[2])


def test_gym_vector_adapter():
    env = RBC2DGymVectorEnv(num_envs=3, seed=5, **CFG)
    obs, _ = env.reset()
    assert obs.shape == (3, 3, 8, 16) and obs.dtype == np.float32
    actions = np.zeros((3, 12), np.float32)
    obs, reward, term, trunc, info = env.step(actions)
    assert reward.shape == (3,)
    assert not trunc.any()
    assert set(info) >= {"t", "step", "nusselt_state", "nusselt_obs"}
    env.close()


def test_autoreset_draws_fresh_ic_each_episode():
    """Regression (round-1 verdict): consecutive episodes of the same env
    slot must start from different initial conditions — the per-env key has
    to advance at every autoreset."""
    env = RBC2DVectorEnv(num_envs=2, **CFG)
    state, first_obs = env.reset(jax.random.PRNGKey(7))
    actions = jnp.zeros((2, 12))

    episode_starts = [np.asarray(first_obs)]
    for _ in range(3):  # run 3 full episodes (3 steps each)
        for _ in range(3):
            state, ts = env.step(state, actions)
        assert bool(ts.truncated.all())
        episode_starts.append(np.asarray(ts.obs))  # post-autoreset IC obs

    for a, b in zip(episode_starts, episode_starts[1:]):
        # every env slot: new episode IC differs from the previous one
        for e in range(2):
            assert not np.array_equal(a[e], b[e]), "autoreset replayed an IC"


def test_autoreset_bank_visits_multiple_indices():
    """Bank-backed envs must sample different episode indices across
    autoresets, not replay one index forever."""
    env = RBC2DVectorEnv(
        num_envs=1,
        checkpoint="/root/reference/data/checkpoints/train/ckpt_ra10000.h5",
        observation_shape=(8, 16),
        heater_duration=1.5,
        episode_length=1.5,  # 1 step per episode → autoreset every step
    )
    state, _ = env.reset(jax.random.PRNGKey(3))
    bank_b = np.asarray(env._bank.b)  # (20, nx, nz)

    def bank_index_of(fields_b):
        d = np.abs(bank_b - fields_b[None]).reshape(bank_b.shape[0], -1).max(1)
        return int(np.argmin(d))

    seen = set()
    for _ in range(8):
        # state.fields after a truncating step holds the fresh bank IC
        state, ts = env.step(state, jnp.zeros((1, 12)))
        assert bool(ts.truncated.all())
        seen.add(bank_index_of(np.asarray(state.fields.b[0])))
    assert len(seen) >= 2, f"bank autoreset stuck on indices {seen}"


def test_checkpoint_bank_vector_reset():
    env = RBC2DVectorEnv(
        num_envs=4,
        checkpoint="/root/reference/data/checkpoints/train/ckpt_ra10000.h5",
        heater_duration=1.5,
        episode_length=300,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.zeros((4, 12)))
    assert np.all(np.asarray(ts.nusselt_state) > 1.0)  # turbulent bank states
    assert np.all(np.isfinite(np.asarray(ts.reward)))


def test_sequential_bank_sampling_is_duplicate_free():
    """Evaluation protocol: bank_sampling="sequential" assigns env i the
    bank state i % bank_size (no replacement up to the bank size), and
    ic_noise decorrelates envs that wrap onto the same bank index."""
    bank = "/root/reference/data/checkpoints/train/ckpt_ra10000.h5"
    env = RBC2DVectorEnv(
        num_envs=24,  # bank has 20 states -> envs 20..23 wrap onto 0..3
        checkpoint=bank,
        bank_sampling="sequential",
        heater_duration=1.5,
        episode_length=300,
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    b = np.asarray(state.fields.b)
    bank_b = np.asarray(env._bank.b)
    n = bank_b.shape[0]
    for i in range(24):
        np.testing.assert_array_equal(b[i], bank_b[i % n])

    noisy = RBC2DVectorEnv(
        num_envs=24,
        checkpoint=bank,
        bank_sampling="sequential",
        ic_noise=1e-3,
        heater_duration=1.5,
        episode_length=300,
    )
    state_n, _ = noisy.reset(jax.random.PRNGKey(0))
    bn = np.asarray(state_n.fields.b)
    # close to the bank state but not identical, and wrapped envs differ
    # from their bank twins
    assert np.abs(bn[0] - bank_b[0]).max() < 1e-2
    assert np.abs(bn[0] - bank_b[0]).max() > 0
    assert np.abs(bn[20] - bn[0]).max() > 0


def test_bank_sampling_validation():
    import pytest

    with pytest.raises(ValueError, match="bank_sampling"):
        RBC2DVectorEnv(num_envs=2, bank_sampling="nope")
