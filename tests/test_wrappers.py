"""Wrapper behavior + functional/gym parity tests."""

import gymnasium as gym
import jax.numpy as jnp
import numpy as np
import pytest

import rbc_gym_tpu  # noqa: F401
from rbc_gym_tpu.wrappers import (
    RBCNormalizeObservation,
    RBCNormalizeReward,
    RBCRewardShaping,
)
from rbc_gym_tpu.wrappers import functional as fn
from rbc_gym_tpu.wrappers.rbc_reward_shaping import compute_cell_distances

SMALL = dict(
    state_shape=(16, 32),
    observation_shape=(8, 16),
    heater_duration=0.3,
    episode_length=3.0,
)


def test_normalize_observation_2d():
    env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    wrapped = RBCNormalizeObservation(env, heater_limit=0.75, u_limit=1.3)
    obs, _ = wrapped.reset(seed=0)
    assert wrapped.observation_space.shape == env.observation_space.shape
    assert np.all(np.abs(obs) <= 1.3 * (1 + 1e-6))
    # conductive-ish T in [1,2] maps into [-1, ~0.45] for limit 0.75
    raw, _ = env.reset(seed=0)
    expected_t = 1.0 * (2 * (raw[0] - 1.0) / (2.75 - 1.0) - 1)
    np.testing.assert_allclose(obs[0], expected_t, rtol=1e-5)
    env.close()


def test_normalize_observation_3d_hill_limit():
    env = gym.make(
        "rbc_gym/RayleighBenardConvection3D-v0",
        state_shape=(8, 16, 16),
        rayleigh_number=2500,
    )
    wrapped = RBCNormalizeObservation(env, heater_limit=0.9, u_limit=None)
    # Hill fit at Ra=2500
    expect = 0.96549382 * 2500**1.06741877 / (
        2500**1.06741877 + 654.37063331**1.06741877
    )
    assert wrapped.max_vals[1] == pytest.approx(expect, rel=1e-6)
    obs, _ = wrapped.reset(seed=0)
    assert np.isfinite(obs).all()
    env.close()


def test_normalize_reward_2d_and_3d():
    env2 = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    w2 = RBCNormalizeReward(env2)
    assert w2.scale == pytest.approx(0.1 * 10_000**0.4)
    # reward -Nu in [-scale, -1] maps to [0, ~1]
    assert w2.reward(-1.0) == pytest.approx(
        (-1 + w2.scale) / (w2.scale - 1)
    ) == pytest.approx(1.0)
    assert w2.reward(-w2.scale) == pytest.approx(0.0)
    env2.close()

    env3 = gym.make(
        "rbc_gym/RayleighBenardConvection3D-v0", state_shape=(8, 16, 16)
    )
    w3 = RBCNormalizeReward(env3)
    assert w3.scale == pytest.approx(0.22 * 500**0.27)
    env3.close()

    assert fn.reward_scale(10_000, three_d=False) == pytest.approx(w2.scale)
    assert fn.reward_scale(500, three_d=True) == pytest.approx(w3.scale)


def test_reward_shaping_wrapper():
    env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    wrapped = RBCRewardShaping(env, shaping_weight=0.5)
    wrapped.reset(seed=0)
    obs, reward, term, trunc, info = wrapped.step(
        env.action_space.sample() * 0
    )
    assert "cell_dist" in info
    assert 0.0 <= info["cell_dist"] <= np.pi
    assert np.isfinite(reward)
    env.close()


def test_reward_shaping_debug_mode():
    """debug_cell_dist renders the reference's matplotlib debug view
    (headless Agg backend) without disturbing reward/info."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    wrapped = RBCRewardShaping(env, shaping_weight=0.5, debug_cell_dist=True)
    wrapped.reset(seed=0)
    obs, reward, term, trunc, info = wrapped.step(
        env.action_space.sample() * 0
    )
    assert "cell_dist" in info and np.isfinite(reward)
    # debug artists hold the last-drawn peak markers
    xs, ys = wrapped.line_cells.get_data()
    assert len(xs) == len(ys)
    env.close()


def test_cell_distance_use_avg():
    """use_avg switches the peak signal to the column-averaged vertical
    velocity (reference compute_cell_distances kwarg)."""
    nx, nz = 32, 4
    x = np.linspace(0, 2 * np.pi, nx, endpoint=False)
    state = np.zeros((3, nz, nx), np.float32)
    # mid-height line flat (no peaks); other rows carry a two-cell signal
    state[2, 0] = np.sin(x)
    state[2, 2] = np.sin(x)
    state[2, 3] = np.sin(x)
    d_mid = compute_cell_distances(state, (nz, nx))
    d_avg = compute_cell_distances(state, (nz, nx), use_avg=True)
    assert d_mid == 0.0  # mid line (row nz/2-1 = 1) is flat
    assert d_avg == 0.0  # single peak of the averaged sine -> one cell
    # two separated peaks in the average -> positive distance
    state[2, 0] = 0.0
    sig = np.full(nx, -0.5, np.float32)
    sig[4] = 3.0
    sig[20] = 3.0
    state[2, 2] = sig
    state[2, 3] = sig
    d_avg2 = compute_cell_distances(state, (nz, nx), use_avg=True)
    want = min(x[20] - x[4], 2 * np.pi - (x[20] - x[4]))
    assert d_avg2 == pytest.approx(want)


def _golden_cell_distance(uy, nx):
    state = np.zeros((3, 4, nx), np.float32)
    state[2, 1] = uy  # UY channel, row nz/2-1 = 1 for nz=4
    return compute_cell_distances(state, (4, nx))


@pytest.mark.parametrize("seed", range(6))
def test_cell_distance_functional_matches_host(seed):
    """Jittable cell distance == scipy-based host implementation."""
    nx = 96
    rng = np.random.default_rng(seed)
    # smooth periodic signal with a few sign changes
    x = np.linspace(0, 2 * np.pi, nx, endpoint=False)
    uy = np.zeros(nx)
    for k in range(1, 5):
        uy += rng.normal() * np.sin(k * x + rng.uniform(0, 2 * np.pi))
    uy *= 0.1

    host = _golden_cell_distance(uy.astype(np.float32), nx)
    dev = float(fn.cell_distance_2d(jnp.asarray(uy, jnp.float32)))
    assert dev == pytest.approx(host, abs=1e-6)


def test_cell_distance_edge_cases():
    nx = 32
    # no peaks
    assert float(fn.cell_distance_2d(jnp.full((nx,), -1.0))) == 0.0
    # single peak
    uy = np.full(nx, -0.5)
    uy[10] = 1.0
    assert float(fn.cell_distance_2d(jnp.asarray(uy))) == 0.0
    # two peaks with down-welling between them -> positive distance
    uy = np.full(nx, -0.5)
    uy[4] = 1.0
    uy[20] = 1.0
    d = float(fn.cell_distance_2d(jnp.asarray(uy)))
    x = np.linspace(0, 2 * np.pi, nx, endpoint=False)
    assert d == pytest.approx(min(x[20] - x[4], 2 * np.pi - (x[20] - x[4])))


def test_functional_obs_norm_matches_wrapper():
    env = gym.make("rbc_gym/RayleighBenardConvection2D-v0", **SMALL)
    wrapped = RBCNormalizeObservation(env, heater_limit=0.75, u_limit=1.3)
    raw, _ = env.reset(seed=1)
    want = wrapped.observation(raw.copy())
    cfg = fn.make_obs_norm_2d(heater_limit=0.75, u_limit=1.3)
    got = np.asarray(fn.normalize_observation(jnp.asarray(raw), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    env.close()
