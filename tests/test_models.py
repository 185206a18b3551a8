"""Model shape/equivalence tests (Flax + torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.models import (
    ActorCriticNetwork,
    FluidCNNExtractor,
    RBCActorCritic,
    periodic_pad_3d,
)


def test_periodic_pad_semantics():
    x = jnp.arange(2 * 3 * 4 * 5 * 1, dtype=jnp.float32).reshape(2, 3, 4, 5, 1)
    p = periodic_pad_3d(x, 1, 1, 1)
    assert p.shape == (2, 5, 6, 7, 1)
    # H wrap: first padded row equals last original row
    np.testing.assert_array_equal(p[:, 1:-1, 0, 1:-1], x[:, :, -1, :])
    np.testing.assert_array_equal(p[:, 1:-1, -1, 1:-1], x[:, :, 0, :])
    # W wrap
    np.testing.assert_array_equal(p[:, 1:-1, 1:-1, 0], x[:, :, :, -1])
    # D zero pad
    np.testing.assert_array_equal(np.asarray(p[:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(p[:, -1]), 0.0)


def test_extractor_feature_count():
    m = FluidCNNExtractor()
    x = jnp.zeros((2, 16, 32, 32, 4))  # (B, D, H, W, C)
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert feats.shape == (2, 2048)


def test_actor_critic_latent_shapes():
    m = ActorCriticNetwork()
    feats = jnp.zeros((3, 2048))
    params = m.init(jax.random.PRNGKey(0), feats, feats)
    pi, vf = m.apply(params, feats, feats)
    assert pi.shape == (3, 64)
    assert vf.shape == (3, 64)


def test_separate_trunks_decouple_value_gradient():
    """Default policies use separate actor/critic feature trunks: the
    value head's gradient must not touch any parameter the action mean
    depends on (the shared-trunk coupling stalled/diverged PPO — the
    critic's return-scale gradients dragged the policy past target_kl)."""
    from rbc_gym_tpu.models import RBCActorCritic2D

    m = RBCActorCritic2D(n_heaters=12)
    obs = jnp.ones((2, 3, 8, 48))
    params = m.init(jax.random.PRNGKey(0), obs)

    value_grad = jax.grad(lambda p: jnp.sum(m.apply(p, obs)[2] ** 2))(params)
    mean_grad = jax.grad(lambda p: jnp.sum(m.apply(p, obs)[0] ** 2))(params)

    flat_v = jax.tree_util.tree_flatten_with_path(value_grad)[0]
    flat_m = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_flatten_with_path(mean_grad)[0]
    )
    overlap = [
        jax.tree_util.keystr(k)
        for k, v in flat_v
        if float(jnp.abs(v).max()) > 0
        and float(jnp.abs(flat_m[jax.tree_util.keystr(k)]).max()) > 0
    ]
    assert overlap == [], f"actor/critic gradients share params: {overlap}"


def test_full_policy_outputs():
    m = RBCActorCritic()
    obs = jnp.zeros((2, 4, 16, 32, 32))  # env layout (B, C, nz, ny, nx)
    params = m.init(jax.random.PRNGKey(0), obs)
    mean, log_std, value = m.apply(params, obs)
    assert mean.shape == (2, 8, 8)
    assert log_std.shape == (8, 8)
    assert value.shape == (2,)
    # gradient flows end to end
    def loss(p):
        mn, ls, v = m.apply(p, obs)
        return jnp.sum(mn**2) + jnp.sum(v**2) + jnp.sum(ls**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_torch_modules_shapes():
    torch = pytest.importorskip("torch")
    from rbc_gym_tpu.models import FluidCNN, ActorCriticTorso

    x = torch.zeros(2, 4, 16, 32, 32)
    feats = FluidCNN()(x)
    assert feats.shape == (2, 2048)
    pi, vf = ActorCriticTorso()(feats)
    assert pi.shape == (2, 64)
    assert vf.shape == (2, 64)
