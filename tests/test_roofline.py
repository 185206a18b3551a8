"""Roofline model consistency checks (utils/roofline.py).

The MXU closed forms must track the real spectral solver: both are
validated against XLA's HLO-level flop count of the compiled solve, so a
future Poisson change (different factorization, different transform
sizes) breaks the test instead of silently skewing the bench utilization
numbers.
"""

import numpy as np
import pytest

from rbc_gym_tpu.utils import roofline as rl


@pytest.mark.parametrize("state_shape", [(64, 96), (32, 48)])
def test_poisson_mxu_flops_2d_match_xla(state_shape):
    nz, nx = state_shape
    analytic = rl.poisson_mxu_flops_per_point_2d(nx, nz)
    counted = rl.xla_poisson_flops_per_point("2d", state_shape)
    # einsum lowering may add the modal elementwise multiply (~O(1)/pt)
    np.testing.assert_allclose(counted, analytic, rtol=0.02)


@pytest.mark.parametrize("state_shape", [(16, 32, 32), (8, 16, 16)])
def test_poisson_mxu_flops_3d_match_xla(state_shape):
    nz, ny, nx = state_shape
    analytic = rl.poisson_mxu_flops_per_point_3d(nx, ny, nz)
    counted = rl.xla_poisson_flops_per_point("3d", state_shape)
    np.testing.assert_allclose(counted, analytic, rtol=0.02)


def test_cost_models_scale_with_config():
    base = rl.cost_3d(state_shape=(16, 32, 32))
    big = rl.cost_3d(state_shape=(32, 64, 64), dt_solver=0.005)
    assert big["n_substeps"] == 25 and base["n_substeps"] == 13
    # 8x the points, ~2x the substeps, larger modal matrices
    assert big["vpu_flops_per_env_step"] > 8 * base["vpu_flops_per_env_step"]
    assert big["min_hbm_bytes_per_env_step"] > 7 * base[
        "min_hbm_bytes_per_env_step"]

    c2 = rl.cost_2d()
    assert c2["n_substeps"] == 50
    m = rl.roofline_metrics(c2, 10_000.0)
    # sanity: a ~10k env-steps/s 2D run sits below both peaks
    assert 0 < m["vpu_utilization_pct"] < 100
    assert 0 < m["mxu_utilization_pct"] < 100
    assert 0 < m["hbm_min_utilization_pct"] < 100


def test_clipped_substep_count_matches_solver():
    from rbc_gym_tpu.sim.solver3d import SimParams3D

    for hd, dt in ((0.125, 0.01), (0.375, 0.01), (0.125, 0.005)):
        params = SimParams3D(heater_duration=hd, dt_solver=dt)
        model = rl.cost_3d(heater_duration=hd, dt_solver=dt)
        assert model["n_substeps"] == len(params.substep_dts())


def test_poisson_mxu_flops_3d_factored_match_xla():
    """Big-grid closed form (factored transforms) vs XLA's HLO count.
    64*32 = 2048 >= FACTORED_POISSON_MIN_NXNZ selects the factored path."""
    state_shape = (32, 16, 64)  # nz, ny, nx -> nx*nz = 2048
    nz, ny, nx = state_shape
    analytic = rl.poisson_mxu_flops_per_point_3d(nx, ny, nz)
    dense = 4.0 * nx * nz + 4.0 * ny
    assert analytic < dense / 5  # the factored form is the cheap one
    counted = rl.xla_poisson_flops_per_point("3d", state_shape)
    np.testing.assert_allclose(counted, analytic, rtol=0.02)
