"""Poisson solver tests: exactness of the modal-inverse solve."""

import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.ops.poisson import make_poisson_solver_2d, make_poisson_solver_3d


def _laplacian_2d(p, dx, dz):
    """Discrete div(grad(.)) with periodic x, Neumann z — the operator the
    projection step effectively inverts."""
    lap_x = (np.roll(p, -1, axis=-2) - 2 * p + np.roll(p, 1, axis=-2)) / dx**2
    pz = np.concatenate([p[..., :1], p, p[..., -1:]], axis=-1)  # Neumann ghosts
    lap_z = (pz[..., 2:] - 2 * p + pz[..., :-2]) / dz**2
    return lap_x + lap_z


def test_poisson_2d_inverts_laplacian():
    nx, nz, dx, dz = 24, 16, 0.3, 0.125
    rng = np.random.default_rng(0)
    p_true = rng.normal(size=(2, nx, nz))
    p_true -= p_true.mean(axis=(-2, -1), keepdims=True)
    rhs = _laplacian_2d(p_true, dx, dz)

    solve = make_poisson_solver_2d(nx, nz, dx, dz, dtype=jnp.float64)
    p = np.asarray(solve(jnp.asarray(rhs)))
    p = p - p.mean(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(p, p_true, atol=1e-9)


def test_poisson_2d_residual():
    nx, nz, dx, dz = 32, 8, 0.2, 0.25
    rng = np.random.default_rng(1)
    # solvable RHS: must have zero mean (compatibility for the mean mode)
    rhs = rng.normal(size=(nx, nz))
    rhs -= rhs.mean()
    solve = make_poisson_solver_2d(nx, nz, dx, dz, dtype=jnp.float64)
    p = np.asarray(solve(jnp.asarray(rhs)))
    np.testing.assert_allclose(_laplacian_2d(p, dx, dz), rhs, atol=1e-9)


def test_poisson_3d_residual():
    nx, ny, nz = 8, 6, 5
    dx, dy, dz = 0.7, 0.4, 0.2
    rng = np.random.default_rng(2)
    rhs = rng.normal(size=(nx, ny, nz))
    rhs -= rhs.mean()
    solve = make_poisson_solver_3d(nx, ny, nz, dx, dy, dz, dtype=jnp.float64)
    p = np.asarray(solve(jnp.asarray(rhs)))

    lap = (np.roll(p, -1, 0) - 2 * p + np.roll(p, 1, 0)) / dx**2
    lap += (np.roll(p, -1, 1) - 2 * p + np.roll(p, 1, 1)) / dy**2
    pz = np.concatenate([p[..., :1], p, p[..., -1:]], axis=-1)
    lap += (pz[..., 2:] - 2 * p + pz[..., :-2]) / dz**2
    np.testing.assert_allclose(lap, rhs, atol=1e-9)
