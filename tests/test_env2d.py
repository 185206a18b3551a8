"""Gym API conformance + behavior tests for the 2D environment."""

import warnings

import gymnasium as gym
import numpy as np
import pytest

import rbc_gym_tpu  # noqa: F401  (registers the gym IDs)

SMALL = dict(
    state_shape=(16, 32),
    observation_shape=(8, 16),
    heater_duration=0.3,
    episode_length=3.0,
)


@pytest.fixture(scope="module")
def env():
    e = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    yield e
    e.close()


def test_registration_defaults():
    spec = gym.spec("rbc_gym/RayleighBenardConvection2D-v0")
    assert spec.kwargs["rayleigh_number"] == 10_000
    assert spec.kwargs["state_shape"] == (64, 96)


def test_check_env():
    from gymnasium.utils.env_checker import check_env

    e = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(e.unwrapped, skip_render_check=True)
    e.close()


def test_reset_step_contract(env):
    obs, info = env.reset(seed=123)
    assert obs.shape == (3, 8, 16)
    assert obs.dtype == np.float32
    assert info["t"] == 0.0 and info["step"] == 1
    assert info["state"].shape == (3, 16, 32)

    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    assert not terminated and not truncated
    assert info["t"] == pytest.approx(0.3)
    assert reward == pytest.approx(-info["nusselt_obs"])
    assert np.isfinite(reward)


def test_truncation_at_episode_length(env):
    env.reset(seed=0)
    steps = 0
    truncated = False
    while not truncated and steps < 20:
        _, _, _, truncated, info = env.step(env.action_space.sample() * 0)
        steps += 1
    assert truncated and steps == 10  # episode_length 3.0 / duration 0.3


def test_seed_reproducibility():
    e1 = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    e2 = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    o1, _ = e1.reset(seed=7)
    o2, _ = e2.reset(seed=7)
    np.testing.assert_array_equal(o1, o2)
    o3, _ = e1.reset(seed=8)
    assert not np.array_equal(o1, o3)
    e1.close()
    e2.close()


def test_pressure_channels():
    e = gym.make(
        "rbc_gym/RayleighBenardConvection2D-v0", pressure=True, **SMALL
    )
    obs, info = e.reset(seed=0)
    assert obs.shape == (5, 8, 16)
    assert info["state"].shape == (5, 16, 32)
    e.close()


def test_checkpoint_reset_reference_file():
    """Reset from a reference-generated HDF5 bank (layout parity)."""
    path = "/root/reference/data/checkpoints/train/ckpt_ra10000.h5"
    e = gym.make(
        "rbc_gym/RayleighBenardConvection2D-v0",
        checkpoint=path,
        heater_duration=1.5,
    )
    obs, info = e.reset(seed=3)
    # checkpoint states are turbulent: convective Nusselt well above conduction
    assert info["nusselt_state"] > 1.0
    assert obs[0].min() >= 1.0 - 1e-5 and obs[0].max() <= 2.75 + 1e-5
    # stepping from a turbulent state stays finite
    obs, reward, *_ = e.step(e.action_space.sample())
    assert np.isfinite(reward)
    e.close()


def test_missing_checkpoint_raises():
    e = gym.make(
        "rbc_gym/RayleighBenardConvection2D-v0",
        checkpoint="/nonexistent/file.h5",
        **SMALL,
    )
    with pytest.raises(FileNotFoundError):
        e.reset(seed=0)
    e.close()


def test_rgb_render():
    e = gym.make(
        "rbc_gym/RayleighBenardConvection2D-v0", render_mode="rgb_array", **SMALL
    )
    e.reset(seed=0)
    img = e.render()
    assert img.shape == (16, 32, 3) and img.dtype == np.uint8
    e.close()
