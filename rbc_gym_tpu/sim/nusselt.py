"""Nusselt-number diagnostics and observation extraction.

Replicates the reference's two Nusselt definitions *exactly* — including
their index-spacing quirk — because they define the reward signal an RL
policy is trained against:

2D (reference sim/rbc_sim2D_api.jl:142-163):

    Nu = ( mean(T * w) - kappa * mean(grad_index(mean_x T)) ) / (kappa db / H)

where ``grad_index`` is a unit-spacing finite-difference gradient over the
*array index* (the reference's ``array_gradient``, sim/rbc_sim2D.jl:206-220
— note: NOT divided by dz), T is the buoyancy tracer and w is sampled at the
bottom z-face of each cell (``get_state`` slices the first Nz face points,
rbc_sim2D_api.jl:113). Computed on either the full state or the
sensor-subsampled observation.

3D (reference sim/rbc_sim3D_api.jl:134-159):

    Nu = 1 + mean(T' * w) / kappa,   T' = b - T_conductive(z)

with the conductive profile built from unit-height cell midpoints
(z = (k+1/2)/Nz regardless of the physical Lz — reference quirk kept).

``nusselt_2d_physical`` additionally provides the standard dimensionally
consistent definition for physics validation against literature values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_gradient(a: jax.Array, axis: int = -1) -> jax.Array:
    """np.gradient with unit spacing (reference array_gradient)."""
    a = jnp.moveaxis(a, axis, -1)
    interior = 0.5 * (a[..., 2:] - a[..., :-2])
    first = (a[..., 1] - a[..., 0])[..., None]
    last = (a[..., -1] - a[..., -2])[..., None]
    out = jnp.concatenate([first, interior, last], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def nusselt_2d(
    t: jax.Array, w: jax.Array, kappa: float, delta_b: float, height: float
) -> jax.Array:
    """Reference 2D Nusselt. t, w: (..., nx, nz) in solver (x, z) order."""
    q1 = jnp.mean(t * w, axis=(-2, -1))
    t_profile = jnp.mean(t, axis=-2)  # horizontal mean -> (..., nz)
    q2 = kappa * jnp.mean(index_gradient(t_profile), axis=-1)
    return (q1 - q2) / (kappa * delta_b / height)


def nusselt_2d_physical(
    t: jax.Array,
    w_center: jax.Array,
    kappa: float,
    delta_b: float,
    height: float,
    dz: float,
) -> jax.Array:
    """Dimensionally consistent volume-averaged Nusselt for validation.

    Nu = ( <w T> - kappa d<T>/dz ) / (kappa delta_b / H) with w interpolated
    to cell centers and a proper dz-spaced vertical gradient.
    """
    q1 = jnp.mean(t * w_center, axis=(-2, -1))
    t_profile = jnp.mean(t, axis=-2)
    q2 = kappa * jnp.mean(index_gradient(t_profile) / dz, axis=-1)
    return (q1 - q2) / (kappa * delta_b / height)


def nusselt_3d(
    b: jax.Array,
    w: jax.Array,
    kappa: float,
    min_b: float,
    delta_b: float,
) -> jax.Array:
    """Reference 3D Nusselt. b, w: (..., nx, ny, nz) in solver order.

    w must already be the bottom-face sample (first nz face points).
    """
    nz = b.shape[-1]
    z = (jnp.arange(nz, dtype=b.dtype) + 0.5) / nz  # unit-height midpoints
    t_conductive = (1.0 - z) * delta_b + min_b
    t_prime = b - t_conductive
    q_conv = jnp.mean(t_prime * w, axis=(-3, -2, -1))
    return 1.0 + q_conv / kappa


def sensor_subsample_2d(field: jax.Array, n_obs_x: int, n_obs_z: int) -> jax.Array:
    """Strided sensor sampling (reference rbc_sim2D_api.jl:123-129).

    field (..., nx, nz) -> (..., n_obs_x, n_obs_z); stride = n // n_obs,
    starting at index 0 (Julia's 1:stride:N).
    """
    nx, nz = field.shape[-2], field.shape[-1]
    sx, sz = nx // n_obs_x, nz // n_obs_z
    return field[..., ::sx, ::sz][..., :n_obs_x, :n_obs_z]
