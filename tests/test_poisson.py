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


def test_poisson_precision_option_plumbed():
    """poisson_precision is accepted end-to-end and rejects unknown names.
    (On CPU the XLA matmul precision is a no-op, so results are identical;
    the on-TPU accuracy/speed table lives in docs/PERF_NOTES_3D.md r4.)"""
    import pytest

    from rbc_gym_tpu.sim.grid import Grid2D, Grid3D
    from rbc_gym_tpu.sim.solver2d import SimParams2D, make_solver2d
    from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

    g2 = Grid2D(nx=32, nz=16, lx=2 * np.pi, lz=2.0)
    s_hi = make_solver2d(g2, SimParams2D(), poisson_precision="highest")
    s_h = make_solver2d(g2, SimParams2D(), poisson_precision="high")
    import jax.numpy as jnp

    f = s_hi.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.zeros((2, 12), jnp.float32)
    out_hi = jax.jit(s_hi.env_step)(f, a)
    out_h = jax.jit(s_h.env_step)(f, a)
    np.testing.assert_allclose(np.asarray(out_hi.b), np.asarray(out_h.b),
                               atol=1e-6)

    g3 = Grid3D(nx=16, ny=16, nz=8, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    make_solver3d(g3, SimParams3D(), poisson_precision="high")
    with pytest.raises(KeyError):
        make_solver3d(g3, SimParams3D(), poisson_precision="exact")
    with pytest.raises(KeyError):
        make_solver2d(g2, SimParams2D(), poisson_precision="bf16")


def test_poisson_3d_factored_equals_dense():
    """The factored x-DFT/z-DCT transforms (big-grid form) are
    algebraically identical to the dense kron analysis (f64 exact)."""
    from rbc_gym_tpu.ops.poisson import make_poisson_solver_3d_bm

    for (nx, ny, nz) in [(16, 8, 8), (8, 16, 4)]:
        dx, dy, dz = 4 * np.pi / nx, 4 * np.pi / ny, 2.0 / nz
        dense = make_poisson_solver_3d_bm(nx, ny, nz, dx, dy, dz,
                                          jnp.float64, factored=False)
        fact = make_poisson_solver_3d_bm(nx, ny, nz, dx, dy, dz,
                                         jnp.float64, factored=True)
        rhs = jax.random.normal(jax.random.PRNGKey(0), (nx, nz, ny, 3),
                                jnp.float64)
        np.testing.assert_allclose(
            np.asarray(fact(rhs)), np.asarray(dense(rhs)), atol=1e-12
        )


def test_poisson_3d_factored_autoselect():
    """Above FACTORED_POISSON_MIN_NXNZ the factored form is the default."""
    from rbc_gym_tpu.ops import poisson as P

    assert P.FACTORED_POISSON_MIN_NXNZ == 1024
    # 64*32 = 2048 >= threshold -> factored; 32*16 = 512 -> dense. Both
    # solve the same system; check a residual on the factored default.
    nx, ny, nz = 64, 8, 32
    dx, dy, dz = 4 * np.pi / nx, 4 * np.pi / ny, 2.0 / nz
    solve = P.make_poisson_solver_3d_bm(nx, ny, nz, dx, dy, dz, jnp.float64)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (nx, nz, ny, 2),
                            jnp.float64)
    rhs = rhs - rhs.mean(axis=(0, 1, 2), keepdims=True)
    p = np.asarray(solve(rhs))
    # discrete Laplacian residual (periodic x/y, Neumann z)
    lap = (
        (np.roll(p, -1, 0) - 2 * p + np.roll(p, 1, 0)) / dx**2
        + (np.roll(p, -1, 2) - 2 * p + np.roll(p, 1, 2)) / dy**2
    )
    pz = np.concatenate([p[:, :1], p, p[:, -1:]], axis=1)
    lap += (pz[:, 2:] - 2 * p + pz[:, :-2]) / dz**2
    np.testing.assert_allclose(lap, np.asarray(rhs), atol=1e-9)
