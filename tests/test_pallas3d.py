"""Fused 3D Pallas kernel vs the XLA batch-minor path (interpret mode, CPU).

The kernel shares the stencil and RK3 structure with solver3d's XLA path;
the Poisson solve and hydrostatic suffix sum use different (but exact)
float32 summation orders, so parity over a full env step is tolerance-based.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

GRID = Grid3D(nx=32, ny=32, nz=16, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)


@pytest.fixture(scope="module")
def solvers():
    params = SimParams3D()
    sx = make_solver3d(GRID, params, dtype=jnp.float32, fused=False)
    sf = make_solver3d(
        GRID, params, dtype=jnp.float32, fused=True,
        fused_interpret=True, e_blk=2,
    )
    return sx, sf


def test_fused_env_step_matches_xla(solvers):
    sx, sf = solvers
    f = sx.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx = jax.jit(sx.env_step)(f, a)
    ff = jax.jit(sf.env_step)(f, a)
    for name in ("u", "v", "w", "b"):
        np.testing.assert_allclose(
            np.asarray(getattr(ff, name)),
            np.asarray(getattr(fx, name)),
            atol=5e-6,
            err_msg=f"field {name}",
        )


@pytest.fixture(scope="module")
def stage_solver():
    """fused='stage': the x-blocked whole-stage kernel (interpret mode)."""
    return make_solver3d(
        GRID, SimParams3D(), dtype=jnp.float32, fused="stage",
        fused_interpret=True, e_blk=2, x_blk=8,
    )


def test_whole_stage_env_step_matches_xla(solvers, stage_solver):
    sx, _ = solvers
    f = sx.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx = jax.jit(sx.env_step)(f, a)
    fs = jax.jit(stage_solver.env_step)(f, a)
    for name in ("u", "v", "w", "b"):
        np.testing.assert_allclose(
            np.asarray(getattr(fs, name)),
            np.asarray(getattr(fx, name)),
            atol=5e-6,
            err_msg=f"field {name}",
        )


def test_fused_falls_back_on_odd_batch(solvers):
    _, sf = solvers
    f = sf.init_random(jax.random.PRNGKey(1), batch_shape=(3,))  # 3 % 2 != 0
    a = jnp.zeros((3, 8, 8), jnp.float32)
    out = jax.jit(sf.env_step)(f, a)  # must trace the XLA fallback
    assert np.isfinite(np.asarray(out.b)).all()


def test_fused_divergence_free(solvers):
    from rbc_gym_tpu.ops import stencils as st

    _, sf = solvers
    f = sf.init_random(jax.random.PRNGKey(2), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    out = jax.jit(sf.env_step)(f, a)
    div = np.asarray(
        st.ddx_f2c(out.u, GRID.dx, axis=-3)
        + st.ddx_f2c(out.v, GRID.dy, axis=-2)
        + st.ddz_f2c(out.w, GRID.dz)
    )
    assert np.max(np.abs(div)) < 5e-4  # float32 projection residual


@pytest.fixture(scope="module")
def stage_qp_solver():
    """fused='stage_qp': stage kernel with the in-kernel Poisson analysis
    (rhat accumulation over x-blocks) + XLA solve tail."""
    return make_solver3d(
        GRID, SimParams3D(), dtype=jnp.float32, fused="stage_qp",
        fused_interpret=True, e_blk=2, x_blk=8,
    )


def test_stage_qp_env_step_matches_xla(solvers, stage_qp_solver):
    """In-kernel analysis accumulation changes only the f32 contraction
    ORDER of the analysis einsum; the env step must stay within the same
    tolerance as the other fused paths."""
    sx, _ = solvers
    f = sx.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx = jax.jit(sx.env_step)(f, a)
    fs = jax.jit(stage_qp_solver.env_step)(f, a)
    for name in ("u", "v", "w", "b"):
        np.testing.assert_allclose(
            np.asarray(getattr(fs, name)),
            np.asarray(getattr(fx, name)),
            atol=5e-6,
            err_msg=f"field {name}",
        )


def test_stage_qp_divergence_free(stage_qp_solver):
    from rbc_gym_tpu.ops import stencils as st

    sq = stage_qp_solver
    f = sq.init_random(jax.random.PRNGKey(2), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    out = jax.jit(sq.env_step)(f, a)
    div = np.asarray(
        st.ddx_f2c(out.u, GRID.dx, axis=-3)
        + st.ddx_f2c(out.v, GRID.dy, axis=-2)
        + st.ddz_f2c(out.w, GRID.dz)
    )
    assert np.max(np.abs(div)) < 5e-4


# ---------------------------------------------------------------------------
# (x,y)-blocked stage kernel (big-grid path, round 5)


@pytest.fixture(scope="module")
def stage_xy_solver():
    """fused='stage_xy': overlapping pl.Element windows over XLA-padded
    fields; x valid-mode + y garbage-halo (see ops/pallas3d.py). A small
    grid exercises the same kernel code the 32x64x64 production grid
    compiles."""
    return make_solver3d(
        GRID, SimParams3D(), dtype=jnp.float32, fused="stage_xy",
        fused_interpret=True, e_blk=2, x_blk=8, y_blk=8,
    )


def test_stage_xy_env_step_matches_xla(solvers, stage_xy_solver):
    sx, _ = solvers
    f = sx.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx = jax.jit(sx.env_step)(f, a)
    fs = jax.jit(stage_xy_solver.env_step)(f, a)
    for name in ("u", "v", "w", "b", "p_nhs"):
        np.testing.assert_allclose(
            np.asarray(getattr(fs, name)),
            np.asarray(getattr(fx, name)),
            atol=5e-6,
            err_msg=f"field {name}",
        )


def test_stage_xy_multiblock_multistep(solvers):
    """Multiple y blocks (nyb=4) and x blocks over 2 env steps: block-edge
    and periodic-wrap errors accumulate visibly if any halo is wrong."""
    sx, _ = solvers
    sxy = make_solver3d(
        GRID, SimParams3D(heater_duration=0.02), dtype=jnp.float32,
        fused="stage_xy", fused_interpret=True, e_blk=2, x_blk=4, y_blk=8,
    )
    sxla = make_solver3d(
        GRID, SimParams3D(heater_duration=0.02), dtype=jnp.float32,
        fused=False,
    )
    f = sx.init_random(jax.random.PRNGKey(2), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx, fs = f, f
    for _ in range(2):
        fx = jax.jit(sxla.env_step)(fx, a)
        fs = jax.jit(sxy.env_step)(fs, a)
    for name in ("u", "v", "w", "b"):
        np.testing.assert_allclose(
            np.asarray(getattr(fs, name)),
            np.asarray(getattr(fx, name)),
            atol=5e-6,
            err_msg=f"field {name}",
        )


def test_big_grid_auto_selects_stage_xy():
    """The 32x64x64 flowstats grid exceeds the x-only kernel's VMEM
    ceiling; auto-select must take the xy path there (on TPU backends) and
    the chunked env_step (fleet > 256)."""
    import rbc_gym_tpu.sim.solver3d as s3

    grid = Grid3D(nx=64, ny=64, nz=32, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    # on CPU the auto-select falls back to XLA unless interpret is forced
    s = make_solver3d(grid, SimParams3D(dt_solver=0.005), fused_interpret=True)
    assert s is not None  # construction alone must not OOM or assert


def test_stage_ew_env_step_matches_xla(solvers):
    """fused='stage_ew': the x-only stage kernel fed by overlapping
    pl.Element windows over x-padded fields (no in-VMEM halo concat),
    at several x_blk including the full-x single block."""
    sx, _ = solvers
    f = sx.init_random(jax.random.PRNGKey(0), batch_shape=(2,))
    a = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 8, 8)), jnp.float32
    )
    fx = jax.jit(sx.env_step)(f, a)
    for x_blk in (8, 32):
        se = make_solver3d(
            GRID, SimParams3D(), dtype=jnp.float32, fused="stage_ew",
            fused_interpret=True, e_blk=2, x_blk=x_blk,
        )
        fe = jax.jit(se.env_step)(f, a)
        for name in ("u", "v", "w", "b", "p_nhs"):
            np.testing.assert_allclose(
                np.asarray(getattr(fe, name)),
                np.asarray(getattr(fx, name)),
                atol=5e-6,
                err_msg=f"x_blk {x_blk}, field {name}",
            )
