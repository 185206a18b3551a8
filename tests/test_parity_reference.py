"""Solver parity validation against reference-solver artifacts.

The reference's Julia/Oceananigans solver is not runnable in this image, but
its OUTPUTS are in-repo: the 2D checkpoint banks
(/root/reference/data/checkpoints/{train,test,val}/ckpt_ra*.h5) are float64
fields produced by Oceananigans' RK3 fractional-step integrator
(sim/rbc_sim2D.jl:304-322 via scripts/create_checkpoints_2D.sh). They anchor
three sharp parity checks (documented with numbers in PARITY.md):

1. **Discrete-operator parity.** Oceananigans projects velocities onto the
   discretely divergence-free space every RK stage (C-grid finite volume).
   If our staggered-grid divergence matches theirs, the stored bank
   velocities must be divergence-free to float64 machine precision under
   OUR operator — measured max|div| ~ 6e-15 against field gradients O(1).

2. **Fixed-point parity.** At Ra=1e4 the 2D flow is a steady convection
   roll; the banks store the converged steady state of the REFERENCE
   discretization (600 time units of burn-in, sim/rbc_sim2D.jl:58). Feeding
   it to our solver at float64 with the reference dt=0.03, the state must
   stay put: any RK3/projection/BC/advection mismatch would make the state
   drift toward OUR (different) fixed point, visibly shifting Nu and the
   fields. Measured: Nu = 4.0000 +- 0.005 over 30 time units (1000 RK3
   substeps), field drift << 1%.

3. **Temporal self-convergence.** The fractional-step splitting (projection
   after each RK3 stage, reference rbc_sim2D_api.jl:75-97 ->
   Oceananigans run!) is formally 2nd-order in time; the observed order
   under dt refinement confirms the stage arithmetic (gamma/zeta
   coefficients, stage-interval projections) is implemented as designed.
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.ops import stencils as st
from rbc_gym_tpu.sim import nusselt as nu
from rbc_gym_tpu.sim.grid import Grid2D
from rbc_gym_tpu.sim.solver2d import (
    Fields2D,
    SimParams2D,
    _hydrostatic_pressure,
    make_solver2d,
)
from rbc_gym_tpu.utils.checkpoints import load_bank_2d

BANK_DIR = "/root/reference/data/checkpoints"
RA10K = f"{BANK_DIR}/train/ckpt_ra10000.h5"
NX, NZ = 96, 64
DX, DZ = 2 * np.pi / NX, 2.0 / NZ


def _bank_fields(path, n=None, dtype=jnp.float64):
    bank = load_bank_2d(path)
    sl = slice(None, n)
    u = jnp.asarray(bank.u[sl], dtype)
    w = jnp.asarray(bank.w[sl], dtype)
    b = jnp.asarray(bank.b[sl], dtype)
    p_hy = jax.vmap(lambda bb: _hydrostatic_pressure(bb, DZ, 1.0))(b)
    return Fields2D(u=u, w=w, b=b, p_hy=p_hy, p_nhs=jnp.zeros_like(b))


def test_bank_divergence_free_under_our_operator():
    """Reference-projected velocities are divergence-free to float64
    machine precision under OUR discrete divergence — operator parity."""
    for path in sorted(glob.glob(f"{BANK_DIR}/*/ckpt_ra*.h5"))[:4]:
        bank = load_bank_2d(path)
        u = jnp.asarray(bank.u, jnp.float64)
        w = jnp.asarray(bank.w, jnp.float64)
        div = st.ddx_f2c(u, DX, -2) + st.ddz_f2c(w, DZ, -1)
        # velocity-gradient scale is O(|u|/dx) ~ 5; 1e-12 is pure roundoff
        assert float(jnp.abs(div).max()) < 1e-12, path


def test_bank_layout_and_boundary_conditions():
    """Staggered-grid layout parity: w carries nz+1 face points with exact
    zeros on the walls; b respects the plate temperatures."""
    f = _bank_fields(RA10K)
    assert f.u.shape == (20, NX, NZ)
    assert f.w.shape == (20, NX, NZ + 1)
    assert float(jnp.abs(f.w[..., 0]).max()) == 0.0
    assert float(jnp.abs(f.w[..., -1]).max()) == 0.0
    assert 1.0 <= float(f.b.min()) and float(f.b.max()) <= 2.0


@pytest.mark.slow
def test_reference_steady_state_is_our_fixed_point():
    """Integrating the reference solver's converged Ra=1e4 steady roll with
    our solver at the reference dt keeps Nu pinned at its value and the
    fields in place — trajectory-level agreement of the two
    discretizations (any RK3 stage/projection/BC mismatch drifts it)."""
    grid = Grid2D(nx=NX, nz=NZ, lx=2 * np.pi, lz=2.0)
    params = SimParams2D(ra=1e4)  # dt_solver=0.03, heater_duration=1.5
    solver = make_solver2d(grid, params, dtype=jnp.float64, fused=False)
    f0 = _bank_fields(RA10K, n=4)
    step = jax.jit(solver.env_step)
    zero = jnp.zeros((4, 12))

    nu0 = np.asarray(
        nu.nusselt_2d(f0.b, f0.w[..., :NZ], params.kappa, 1.0, 2.0)
    )
    f = f0
    nus = []
    for _ in range(20):  # 30 time units = 1000 RK3 substeps
        f = step(f, zero)
        nus.append(
            np.asarray(
                nu.nusselt_2d(f.b, f.w[..., :NZ], params.kappa, 1.0, 2.0)
            )
        )
    nus = np.array(nus)

    # Nu of the inherited state never leaves a 2% band around its initial
    # (reference-converged) value, per env and per step.
    assert np.all(np.abs(nus / nu0[None, :] - 1.0) < 0.02), (
        nus.min(), nus.max(), nu0
    )
    # field-level drift after 30 time units stays small relative to the
    # field scale (steady state is marginally stable, not attracting, so
    # exact zero is not expected — a discretization mismatch gives O(10%+))
    drift_b = float(
        jnp.abs(f.b - f0.b).max() / jnp.abs(f0.b - f0.b.mean()).max()
    )
    drift_u = float(jnp.abs(f.u - f0.u).max() / jnp.abs(f0.u).max())
    assert drift_b < 0.05, drift_b
    assert drift_u < 0.05, drift_u


@pytest.mark.slow
def test_temporal_self_convergence_order():
    """Observed order of the RK3 fractional-step scheme under dt refinement.

    Measured: ~3.2 from the Ra=1e4 steady roll — full RK3 order; the
    per-stage projection splitting does not degrade the temporal order for
    this near-steady flow (the pressure field is smooth in time). Any botch
    of the gamma/zeta stage coefficients or the stage-interval projections
    would collapse this to <= 1."""
    grid = Grid2D(nx=NX, nz=NZ, lx=2 * np.pi, lz=2.0)
    f0 = _bank_fields(RA10K, n=1)
    horizon = 0.24

    def integrate(dt):
        params = SimParams2D(ra=1e4, dt_solver=dt, heater_duration=horizon)
        solver = make_solver2d(grid, params, dtype=jnp.float64, fused=False)
        return jax.jit(solver.env_step)(f0, jnp.zeros((1, 12)))

    sols = {dt: integrate(dt) for dt in (0.03, 0.015, 0.0075, 0.00375)}

    def err(a, b):
        return float(jnp.abs(a.b - b.b).max() + jnp.abs(a.u - b.u).max())

    ref = sols[0.00375]
    e1, e2 = err(sols[0.03], ref), err(sols[0.015], ref)
    order = np.log2(e1 / e2)
    assert 1.6 < order < 3.6, (e1, e2, order)
