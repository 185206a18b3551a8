"""3D solver tests: equilibrium, incompressibility, physics oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.ops import stencils as st
from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.sim.solver3d import Fields3D, SimParams3D, make_solver3d
from rbc_gym_tpu.sim import nusselt as nu

GRID = Grid3D(nx=16, ny=16, nz=8, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)


def test_substep_dts_clipping():
    p = SimParams3D(heater_duration=0.125, dt_solver=0.01)  # 0.5 / 0.04
    dts = p.substep_dts()
    assert len(dts) == 13
    np.testing.assert_allclose(dts[:-1], 0.04)
    np.testing.assert_allclose(dts[-1], 0.02)
    np.testing.assert_allclose(dts.sum(), 0.5)

    p = SimParams3D(heater_duration=0.25, dt_solver=0.005)  # exact: 50 steps
    dts = p.substep_dts()
    assert len(dts) == 50
    np.testing.assert_allclose(dts, 0.02)


def test_conduction_equilibrium_3d():
    params = SimParams3D(ra=2500.0)
    s = make_solver3d(GRID, params, dtype=jnp.float64)
    z_c = GRID.z_centers()
    b0 = params.min_b + (GRID.lz - z_c) * params.delta_b / 2.0
    f = Fields3D(
        u=jnp.zeros(GRID.shape_c, jnp.float64),
        v=jnp.zeros(GRID.shape_c, jnp.float64),
        w=jnp.zeros(GRID.shape_w, jnp.float64),
        b=jnp.asarray(np.broadcast_to(b0, GRID.shape_c).copy()),
        p_hy=jnp.zeros(GRID.shape_c, jnp.float64),
        p_nhs=jnp.zeros(GRID.shape_c, jnp.float64),
    )
    step = jax.jit(s.env_step)
    action = jnp.zeros((8, 8), jnp.float64)
    for _ in range(3):
        f = step(f, action)
    np.testing.assert_allclose(np.asarray(f.u), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f.v), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f.w), 0.0, atol=1e-12)
    # conduction Nusselt is exactly 1 in the reference's 3D definition
    nus = nu.nusselt_3d(f.b, f.w[..., : GRID.nz], params.kappa, 1.0, 1.0)
    np.testing.assert_allclose(float(nus), 1.0, atol=1e-10)


def test_divergence_free_3d():
    params = SimParams3D(ra=2500.0)
    s = make_solver3d(GRID, params, dtype=jnp.float64)
    f = s.init_random(jax.random.PRNGKey(0))
    action = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 8)))
    f = jax.jit(s.env_step)(f, action)
    div = np.asarray(
        st.ddx_f2c(f.u, GRID.dx, axis=-3)
        + st.ddx_f2c(f.v, GRID.dy, axis=-2)
        + st.ddz_f2c(f.w, GRID.dz)
    )
    assert np.max(np.abs(div)) < 1e-8


def test_preprocess_action_parity():
    """Golden replication of reference preprocess_action (rbc_sim3D.jl:111-128)."""
    params = SimParams3D()
    s = make_solver3d(GRID, params, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (8, 8))
    got = np.asarray(s.preprocess_action(jnp.asarray(a)))
    centered = a - a.mean()
    k = max(1.0, np.abs(centered).max())
    want = 2.0 + (centered / k) * 0.9
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # zero action -> uniform plate at min_b + delta_b = 2
    np.testing.assert_allclose(
        np.asarray(s.preprocess_action(jnp.zeros((8, 8)))), 2.0
    )


@pytest.mark.slow
def test_nusselt_ra_oracle():
    """Physics oracle: steady-state Nu vs the reference flowstats table
    (BASELINE.md). Run at the default env resolution — coarser than the
    table's 64x64x32, so tolerances are wide but ordering must hold."""
    targets = {500.0: 1.368, 2000.0: 1.762}
    results = {}
    for ra, _ in targets.items():
        params = SimParams3D(ra=ra)
        grid = Grid3D(nx=32, ny=32, nz=16, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
        s = make_solver3d(grid, params, dtype=jnp.float32)
        f = s.init_random(jax.random.PRNGKey(0))
        step = jax.jit(s.env_step)
        act = jnp.zeros((8, 8))
        nus = []
        for i in range(160):
            f = step(f, act)
            if i >= 110:
                nus.append(
                    float(
                        nu.nusselt_3d(
                            f.b, f.w[..., :16], params.kappa, 1.0, 1.0
                        )
                    )
                )
        results[ra] = np.mean(nus)
    assert abs(results[500.0] - targets[500.0]) < 0.15
    assert abs(results[2000.0] - targets[2000.0]) < 0.3
    assert results[2000.0] > results[500.0]


def test_env_chunking_matches_direct():
    """lax.map env chunking (big-grid HBM guard) is numerically equivalent
    to the direct path within f32 fusion tolerance, including broadcastable
    (unbatched) actions."""
    import jax.numpy as jnp

    grid = Grid3D(nx=8, ny=8, nz=4, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    params = SimParams3D(heater_duration=0.02)
    s0 = make_solver3d(grid, params, dtype=jnp.float32, fused=False,
                       env_chunk=None)
    s1 = make_solver3d(grid, params, dtype=jnp.float32, fused=False,
                       env_chunk=2)
    f = s0.init_random(jax.random.PRNGKey(0), (6,))
    rng = np.random.default_rng(3)
    for shape in ((6, 8, 8), (8, 8)):
        a = jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
        r0 = jax.jit(s0.env_step)(f, a)
        r1 = jax.jit(s1.env_step)(f, a)
        for name in ("u", "v", "w", "b", "p_nhs"):
            np.testing.assert_allclose(
                np.asarray(getattr(r1, name)),
                np.asarray(getattr(r0, name)),
                atol=5e-6, err_msg=f"action {shape}, field {name}",
            )
