"""Flax policy/value networks for the 3D RBC control task.

Architecture parity targets (freshly implemented in Flax/NHWC):

* ``FluidCNNExtractor`` — reference models/CNN.py:33-73: two blocks of
  [periodic pad -> Conv3D(k=3) -> GELU -> MaxPool3D(2)], mapping a
  (4, 16, 32, 32) observation to 8 * 4 * 8 * 8 = 2048 features. Padding is
  circular in the two horizontal (periodic) axes and zero in the bounded
  vertical axis (reference models/CNN.py:9-30).
* ``ActorCriticNetwork`` — reference models/CustomNetwork.py:14-81: actor
  collapses depth with a (4,1,1) conv to an 8x8 logit grid; critic conv
  stack + maxpool to 64 latent features.
* ``RBCActorCritic`` — the full policy: extractor + network + diagonal
  Gaussian action head (state-independent log_std) + value head, i.e. what
  SB3's ActorCriticPolicy assembles around the reference modules.

Layout note: reference torch modules are NCDHW; these are NDHWC (channels
last), the layout XLA prefers on TPU. D = z (bounded), H = y, W = x
(periodic).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def periodic_pad_3d(x: jax.Array, pad_d: int = 1, pad_h: int = 1,
                    pad_w: int = 1) -> jax.Array:
    """Circular pad in H/W (periodic axes), zero pad in D (bounded vertical).

    x: (..., D, H, W, C).
    """
    if pad_h > 0:
        x = jnp.concatenate(
            [x[..., :, -pad_h:, :, :], x, x[..., :, :pad_h, :, :]], axis=-3
        )
    if pad_w > 0:
        x = jnp.concatenate(
            [x[..., :, :, -pad_w:, :], x, x[..., :, :, :pad_w, :]], axis=-2
        )
    if pad_d > 0:
        pad = [(0, 0)] * x.ndim
        pad[-4] = (pad_d, pad_d)
        x = jnp.pad(x, pad)
    return x


class FluidCNNExtractor(nn.Module):
    """(B, D, H, W, C_in) -> (B, features_dim) feature vector."""

    hidden_channels: int = 8
    features_dim: int = 8 * 4 * 8 * 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(2):
            x = periodic_pad_3d(x)
            x = nn.Conv(self.hidden_channels, (3, 3, 3), padding="VALID")(x)
            x = nn.gelu(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        feats = x.reshape(x.shape[0], -1)
        assert feats.shape[-1] == self.features_dim, (
            f"Expected {self.features_dim} features, got {feats.shape[-1]}."
        )
        return feats


class ActorCriticNetwork(nn.Module):
    """Latent actor/critic heads over the extractor's (B, 4, 8, 8, 8) map."""

    latent_shape: Tuple[int, int, int, int] = (4, 8, 8, 8)  # (D, H, W, C)

    @nn.compact
    def __call__(
        self, pi_feats: jax.Array, vf_feats: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """``pi_feats``/``vf_feats`` may be the same array (shared
        extractor, reference semantics) or come from separate extractors."""
        d, h, w, c = self.latent_shape

        # --- actor: conv stack collapsing depth -> (B, H*W) logits ---------
        a = pi_feats.reshape(pi_feats.shape[0], d, h, w, c)
        a = periodic_pad_3d(a)
        a = nn.gelu(nn.Conv(4, (3, 3, 3), padding="VALID")(a))
        a = periodic_pad_3d(a)
        a = nn.gelu(nn.Conv(1, (3, 3, 3), padding="VALID")(a))
        a = nn.Conv(1, (d, 1, 1), padding="VALID")(a)  # collapse depth
        pi_latent = a.reshape(a.shape[0], -1)  # (B, 64)

        # --- critic ---------------------------------------------------------
        v = vf_feats.reshape(vf_feats.shape[0], d, h, w, c)
        v = periodic_pad_3d(v)
        v = nn.gelu(nn.Conv(4, (3, 3, 3), padding="VALID")(v))
        v = periodic_pad_3d(v)
        v = nn.gelu(nn.Conv(2, (3, 3, 3), padding="VALID")(v))
        v = nn.max_pool(v, (2, 2, 2), strides=(2, 2, 2))
        vf_latent = v.reshape(v.shape[0], -1)  # (B, 64)

        return pi_latent, vf_latent


def periodic_pad_2d(x: jax.Array, pad_h: int = 1, pad_w: int = 1) -> jax.Array:
    """(B, H, W, C): circular pad in W (periodic x), zero pad in H
    (bounded z) — the 2D analogue of ``periodic_pad_3d``."""
    x = jnp.concatenate([x[:, :, -pad_w:], x, x[:, :, :pad_w]], axis=2)
    return jnp.pad(x, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)))


class RBCActorCritic2D(nn.Module):
    """Diagonal-Gaussian actor-critic for the 2D env (no reference
    counterpart — the reference trains on 3D only; this follows the same
    periodic-pad CNN pattern as ``RBCActorCritic``).

    Input obs: (B, C, nz_o, nx_o) as the env produces (channels first);
    output action mean is (B, n_heaters) over the bottom-plate segments.
    """

    n_heaters: int = 12
    hidden_channels: int = 32
    log_std_init: float = 0.0
    # Separate actor/critic conv trunks by default. With a shared trunk
    # the critic's large-magnitude return-regression gradients drag the
    # policy head along and blow the per-minibatch KL past any trust
    # region (observed: target_kl early stopping fires on the SECOND
    # minibatch of every iteration and training stalls; without target_kl
    # this is the round-2 divergence). The reference sets SB3's
    # share_features_extractor=True (experiments/run_sarl.py:160) — kept
    # available behind this flag for architecture parity.
    shared_trunk: bool = False

    def _trunk(self, x: jax.Array) -> jax.Array:
        for _ in range(2):
            x = periodic_pad_2d(x)
            x = nn.gelu(
                nn.Conv(self.hidden_channels, (3, 3), padding="VALID")(x)
            )
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape(x.shape[0], -1)

    @nn.compact
    def __call__(self, obs: jax.Array):
        x = jnp.moveaxis(obs, -3, -1)  # (B, nz, nx, C)
        pi_feats = self._trunk(x)
        vf_feats = pi_feats if self.shared_trunk else self._trunk(x)
        pi = nn.gelu(nn.Dense(128)(pi_feats))
        vf = nn.gelu(nn.Dense(128)(vf_feats))
        mean = nn.Dense(self.n_heaters)(pi)
        value = nn.Dense(1)(vf)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.log_std_init,
                                        jnp.float32),
            (self.n_heaters,),
        )
        return mean, log_std, value


class RBCActorCritic(nn.Module):
    """Full diagonal-Gaussian actor-critic policy for the 3D env.

    Input obs: (B, C, nz, ny, nx) as produced by the env (channels first,
    python order); converted to NDHWC internally. Output action mean is
    (B, S, S) over the heater grid.
    """

    action_grid: Tuple[int, int] = (8, 8)
    log_std_init: float = 0.0
    # Reference parity would be True (SB3 share_features_extractor=True,
    # experiments/run_sarl.py:160); False keeps the critic's return-scale
    # gradients out of the actor's features — see RBCActorCritic2D.
    share_features_extractor: bool = False

    @nn.compact
    def __call__(self, obs: jax.Array):
        x = jnp.moveaxis(obs, -4, -1)  # (B, nz, ny, nx, C)
        feats = FluidCNNExtractor()(x)
        vf_feats = (
            feats if self.share_features_extractor else FluidCNNExtractor()(x)
        )
        pi_latent, vf_latent = ActorCriticNetwork()(feats, vf_feats)

        s1, s2 = self.action_grid
        mean = nn.Dense(s1 * s2)(pi_latent).reshape(-1, s1, s2)
        value = nn.Dense(1)(vf_latent)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.log_std_init,
                                        jnp.float32),
            (s1, s2),
        )
        return mean, log_std, value
