"""Heater actuation: agent action -> bottom-plate temperature profile.

Behavioral spec (SURVEY §2.4):

2D (reference sim/rbc_sim2D.jl:87-133, ``collate_actions_colin``): 12 heater
segments over x in (0, Lx). Actions are scaled by the heater limit,
mean-subtracted (energy-neutral heating), renormalized so no segment exceeds
the limit, offset by the bottom rest temperature 2, and blended with smooth
cubic transitions of half-width 0.03 at segment boundaries (periodic
wrap-around).

3D (reference sim/rbc_sim3D.jl:111-141, ``preprocess_action`` + ``bottom_T``):
mean-subtract, divide by K = max(1, max|a|), scale by the limit, offset by
min_b + delta_b; piecewise-constant 8x8 tiling with no smoothing.

The reference evaluates its profile through a per-grid-point Julia callback
inside every RK stage; here the whole profile is precomputed once per env
step as a dense array (batched over environments), so the boundary fill is a
pure broadcast inside the compiled step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def heater_profile_2d(
    action: jax.Array,
    x_centers: np.ndarray,
    lx: float,
    n_segments: int,
    limit: float,
    rest_temperature: float = 2.0,
    transition_halfwidth: float = 0.03,
) -> jax.Array:
    """Bottom-plate temperature at cell centers. action (..., S) -> (..., nx)."""
    values = limit * action
    mean_v = jnp.mean(values, axis=-1, keepdims=True)
    centered = values - mean_v
    k2 = jnp.maximum(
        1.0, jnp.max(jnp.abs(centered), axis=-1, keepdims=True) / limit
    )
    t_seg = rest_temperature + centered / k2  # (..., S)

    seg_len = lx / n_segments
    seg = np.floor(x_centers / seg_len).astype(np.int64)
    seg = np.clip(seg, 0, n_segments - 1)
    x_pos = jnp.asarray(x_centers - seg * seg_len, dtype=action.dtype)  # (nx,)

    t0 = jnp.take(t_seg, (seg - 1) % n_segments, axis=-1)  # left neighbor
    t1 = jnp.take(t_seg, seg, axis=-1)  # own segment
    t2 = jnp.take(t_seg, (seg + 1) % n_segments, axis=-1)  # right neighbor

    dxw = transition_halfwidth
    cubic_l = t0 + ((t0 - t1) / (4 * dxw**3)) * (x_pos - 2 * dxw) * (x_pos + dxw) ** 2
    xr = x_pos - seg_len
    cubic_r = t1 + ((t1 - t2) / (4 * dxw**3)) * (xr - 2 * dxw) * (xr + dxw) ** 2

    profile = jnp.where(x_pos < dxw, cubic_l, jnp.where(xr >= -dxw, cubic_r, t1))
    return profile


def preprocess_action_3d(
    action: jax.Array,
    limit: float,
    min_b: float,
    delta_b: float,
) -> jax.Array:
    """Action (..., S, S) -> per-tile bottom temperatures (..., S, S).

    Mean-subtract, normalize by K = max(1, max|a|), scale by the limit, offset
    by min_b + delta_b (reference sim/rbc_sim3D.jl:111-128).
    """
    centered = action - jnp.mean(action, axis=(-2, -1), keepdims=True)
    k = jnp.maximum(1.0, jnp.max(jnp.abs(centered), axis=(-2, -1), keepdims=True))
    return (min_b + delta_b) + (centered / k) * limit


def heater_profile_3d(
    tile_temps: jax.Array,
    x_centers: np.ndarray,
    y_centers: np.ndarray,
    lx: float,
    ly: float,
    n_segments: int,
) -> jax.Array:
    """Tile temperatures (..., S, S) -> bottom-plate field (..., nx, ny).

    Piecewise-constant lookup: tile i = clamp(floor(x / Lx * S)), likewise j
    (reference sim/rbc_sim3D.jl:131-141, indexed action[i, j] with x -> first
    tile axis).
    """
    ix = np.clip(
        np.floor(x_centers / lx * n_segments).astype(np.int64), 0, n_segments - 1
    )
    iy = np.clip(
        np.floor(y_centers / ly * n_segments).astype(np.int64), 0, n_segments - 1
    )
    field = jnp.take(tile_temps, ix, axis=-2)  # (..., nx, S)
    return jnp.take(field, iy, axis=-1)  # (..., nx, ny)
