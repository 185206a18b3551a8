"""Jittable, batched equivalents of the gym wrappers.

These run inside the compiled vector-env / PPO pipeline (no host round
trips). Semantics mirror the gym wrappers exactly; the cell-distance
computation re-derives scipy.signal.find_peaks' core rule (strict local
maxima above a height threshold) as a masked O(nx^2) reduction so it jits
and vmaps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ObsNorm(NamedTuple):
    """Per-channel affine normalization constants."""

    min_vals: jax.Array  # (C,)
    max_vals: jax.Array  # (C,)
    maxval: float = 1.0
    clip: bool = False


def make_obs_norm_2d(
    heater_limit: float,
    u_limit: float = 1.3,
    maxval: float = 1.0,
    clip: bool = False,
    min_t: float = 1.0,
    max_t: float = 2.0,
    n_channels: int = 3,
) -> ObsNorm:
    mins = [min_t] + [-u_limit] * (n_channels - 1)
    maxs = [max_t + heater_limit] + [u_limit] * (n_channels - 1)
    return ObsNorm(
        jnp.asarray(mins, jnp.float32), jnp.asarray(maxs, jnp.float32),
        maxval, clip,
    )


def make_obs_norm_3d(
    ra: float,
    heater_limit: float = 0.9,
    u_limit: float | None = None,
    maxval: float = 1.0,
    clip: bool = False,
    min_t: float = 1.0,
    max_t: float = 2.0,
) -> ObsNorm:
    if u_limit is None:
        from rbc_gym_tpu.wrappers.rbc_normalize_observation import u_limit_3d

        u_limit = u_limit_3d(ra)
    mins = [min_t, -u_limit, -u_limit, -u_limit]
    maxs = [max_t + heater_limit, u_limit, u_limit, u_limit]
    return ObsNorm(
        jnp.asarray(mins, jnp.float32), jnp.asarray(maxs, jnp.float32),
        maxval, clip,
    )


def normalize_observation(obs: jax.Array, cfg: ObsNorm,
                          channel_axis: int = -3) -> jax.Array:
    """obs (..., C, *spatial) -> normalized. channel_axis locates C."""
    nd = obs.ndim
    ax = channel_axis % nd
    shape = [1] * nd
    shape[ax] = cfg.min_vals.shape[0]
    mins = cfg.min_vals.reshape(shape)
    maxs = cfg.max_vals.reshape(shape)
    out = cfg.maxval * (2.0 * (obs - mins) / (maxs - mins) - 1.0)
    if cfg.clip:
        out = jnp.clip(out, -cfg.maxval, cfg.maxval)
    return out


def reward_scale(ra: float, three_d: bool) -> float:
    """Nu_max power law (reference rbc_normalize_reward.py:13-25)."""
    s, a = (0.22, 0.27) if three_d else (0.1, 0.4)
    return float(s * ra**a)


def normalize_reward(reward: jax.Array, scale: float) -> jax.Array:
    return (reward + scale) / (scale - 1.0)


def cell_distance_2d(uy: jax.Array, lx: float = 2 * np.pi) -> jax.Array:
    """Batched Bénard-cell distance from a mid-height w line.

    uy: (..., nx) vertical velocity along x. Returns (...,) max pairwise
    periodic distance between peaks, with same-cell pairs (no down-welling
    between them) zeroed — matching the gym wrapper / reference
    compute_cell_distances.
    """
    nx = uy.shape[-1]
    x = jnp.linspace(0.0, lx, nx, endpoint=False)

    left = jnp.roll(uy, 1, axis=-1)
    right = jnp.roll(uy, -1, axis=-1)
    interior = jnp.ones(nx, bool).at[0].set(False).at[-1].set(False)
    peaks = (uy > left) & (uy > right) & (uy >= 0.001) & interior  # (..., nx)

    # prefix counts of non-positive samples: c[k] = #(uy[..., :k] <= 0)
    nonpos = (uy <= 0).astype(jnp.int32)
    c = jnp.cumsum(nonpos, axis=-1)  # c[k] counts uy[..., :k+1]
    c = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)  # (..., nx+1)
    total = c[..., -1:]

    d1 = jnp.abs(x[None, :] - x[:, None])  # (nx, nx)
    d2 = lx - d1
    d = jnp.minimum(d1, d2)

    iu = jnp.triu(jnp.ones((nx, nx), bool), k=1)  # pairs i < j
    pair_mask = peaks[..., :, None] & peaks[..., None, :] & iu

    # all(uy[i:j] > 0)  <=>  c[j] - c[i] == 0
    ci = c[..., :-1][..., :, None]  # c[i]
    cj = c[..., :-1][..., None, :]  # c[j]
    inner_updraft = (cj - ci) == 0
    # wrap: all(uy[j:] > 0) and all(uy[:i] > 0)
    wrap_updraft = ((total[..., None] - cj) + ci) == 0

    same_cell = jnp.where(d1 < d2, inner_updraft, wrap_updraft)
    dist = jnp.where(pair_mask & ~same_cell, d, 0.0)
    return jnp.max(dist, axis=(-2, -1))


def shaped_reward(reward: jax.Array, cell_dist: jax.Array,
                  shaping_weight: float) -> jax.Array:
    cd_normalized = (-cell_dist + jnp.pi) / jnp.pi
    return (1.0 - shaping_weight) * reward + shaping_weight * cd_normalized
