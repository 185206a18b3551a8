"""2D Rayleigh-Bénard solver: RK3 fractional-step on the staggered C-grid.

Physics (matching the reference's Oceananigans NonhydrostaticModel setup,
sim/rbc_sim2D.jl:149-160):

    du/dt = -div(u u) - dp/dx + nu laplace(u)
    dw/dt = -div(u w) - dp/dz + nu laplace(w) + b
    db/dt = -div(u b) + kappa laplace(b)
    div(u) = 0

with nu = sqrt(Pr/Ra), kappa = 1/sqrt(Pr*Ra) (sim/rbc_sim2D.jl:17-18),
buoyancy tracer b, UB5 flux-form advection, no-slip walls (u = 0), fixed top
temperature min_b and actuated bottom temperature, periodic x.

Pressure is split p = pHY' + pNHS: the hydrostatic anomaly pHY' satisfies
d(pHY')/dz = b discretely (cumulative integral from the top), which cancels
buoyancy from the w equation exactly and adds -d(pHY')/dx to the u equation;
pNHS is the projection pressure from the Poisson solve. Both are part of the
observable state (reference rbc_sim2D_api.jl:102-118).

Time stepping: the low-storage 3-stage RK3 of the reference's
``:RungeKutta3`` timestepper, stage update

    q <- q + dt (gamma_m G_m + zeta_m G_{m-1}),

gamma = (8/15, 5/12, 3/4), zeta = (0, -17/60, -5/12), with a pressure
projection over the stage interval dt_m = (gamma_m + zeta_m) dt after every
stage.

Everything operates on arrays shaped (..., nx, nz[+1]) where ``...`` is an
arbitrary batch of environments — the whole vector environment is one XLA
program; no Python loops over envs anywhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.ops import stencils as st
from rbc_gym_tpu.ops.pallas2d import (
    DEFAULT_E_BLK,
    make_env_step_fused_2d,
    make_tendencies_2d,
)
from rbc_gym_tpu.ops.poisson import make_poisson_solver_2d_bm
from rbc_gym_tpu.sim.actuation import heater_profile_2d
from rbc_gym_tpu.sim.grid import Grid2D

RK3_GAMMA = (8.0 / 15.0, 5.0 / 12.0, 3.0 / 4.0)
RK3_ZETA = (0.0, -17.0 / 60.0, -5.0 / 12.0)


@dataclasses.dataclass(frozen=True)
class SimParams2D:
    """Static simulation parameters (defaults: reference rbc_sim2D_api.jl:17-38)."""

    ra: float = 1.0e4
    pr: float = 0.7
    min_b: float = 1.0
    delta_b: float = 1.0
    dt_solver: float = 0.03
    heater_duration: float = 1.5  # env step interval ("dt" in the reference API)
    n_heaters: int = 12
    heater_limit: float = 0.75
    random_kick: float = 0.01

    @property
    def nu(self) -> float:
        return float(np.sqrt(self.pr / self.ra))

    @property
    def kappa(self) -> float:
        return float(1.0 / np.sqrt(self.pr * self.ra))

    @property
    def substeps_per_env_step(self) -> int:
        n = self.heater_duration / self.dt_solver
        n_int = int(round(n))
        if abs(n - n_int) > 1e-9:
            # Oceananigans run! overshoots to stop_time with a final partial
            # step; we require divisibility to keep the scan length static.
            raise ValueError(
                f"heater_duration {self.heater_duration} must be an integer "
                f"multiple of dt_solver {self.dt_solver}"
            )
        return n_int


class Fields2D(NamedTuple):
    """Prognostic + diagnostic fields; leading axes are env batch axes."""

    u: jax.Array  # (..., nx, nz)    x-velocity at (x-face, z-center)
    w: jax.Array  # (..., nx, nz+1)  z-velocity at (x-center, z-face)
    b: jax.Array  # (..., nx, nz)    buoyancy at centers
    p_hy: jax.Array  # (..., nx, nz) hydrostatic anomaly pressure
    p_nhs: jax.Array  # (..., nx, nz) nonhydrostatic (projection) pressure


class Solver2D(NamedTuple):
    """Compiled-function bundle for one grid+params configuration."""

    grid: Grid2D
    params: SimParams2D
    init_random: Callable  # (key, batch_shape) -> Fields2D
    env_step: Callable  # (Fields2D, action (..., S)) -> Fields2D
    substep: Callable  # (Fields2D, bottom_b (..., nx)) -> Fields2D
    heater_profile: Callable  # action (..., S) -> (..., nx)


def _hydrostatic_pressure(
    b: jax.Array, dz: float, min_b: float, axis: int = -1
) -> jax.Array:
    """pHY'(z) = -integral_z^Lz b dz', cumulative from the top at centers.

    Discretely (p[k] - p[k-1])/dz equals the face-interpolated buoyancy, so
    the w-momentum cancellation with the buoyancy term is exact. The z axis
    is ``axis`` (minor for batch-major layout, -2 for batch-minor).
    """
    n = b.shape[axis]
    b_lo = jax.lax.slice_in_dim(b, 0, n - 1, axis=axis)
    b_hi = jax.lax.slice_in_dim(b, 1, n, axis=axis)
    b_face = 0.5 * (b_lo + b_hi)  # interior faces 1..nz-1
    # top half-cell: face value is the Dirichlet top BC min_b
    top = jnp.full_like(
        jax.lax.slice_in_dim(b, 0, 1, axis=axis), 0.5 * dz * min_b
    )
    increments = jnp.concatenate([dz * b_face, top], axis=axis)
    # p[k] = -(sum of increments k+1..nz-1 + top half) -> reverse cumsum
    rev = jnp.flip(increments, axis=axis)
    csum = jnp.cumsum(rev, axis=axis)
    return -jnp.flip(csum, axis=axis)


def make_solver2d(
    grid: Grid2D,
    params: SimParams2D,
    dtype=jnp.float32,
    fused: bool | None = None,
    fused_interpret: bool = False,
    e_blk: int = DEFAULT_E_BLK,
    poisson_precision: str | None = None,
) -> Solver2D:
    """Build the 2D solver function bundle.

    ``fused`` selects the Pallas fused-stage kernel for the RK3 tendencies
    (numerically identical to the XLA stencil path; ~4x less HBM traffic).
    Default: auto — on for float32 on TPU, off otherwise. Batches whose
    env count is not a multiple of ``e_blk`` fall back to the XLA path at
    trace time. ``fused_interpret`` runs the kernel in the Pallas
    interpreter (CPU testing only).
    """
    nx, nz = grid.nx, grid.nz
    dx, dz = grid.dx, grid.dz
    nu = jnp.asarray(params.nu, dtype)
    kappa = jnp.asarray(params.kappa, dtype)
    min_b = params.min_b

    # Spectral-solve MXU precision. Mosaic's in-kernel dot_general lowers
    # only DEFAULT and HIGHEST (NotImplementedError on HIGH), and the
    # manual bf16x3 substitute (pre-split hi/lo matrices + three 1-pass
    # bf16 dots, pallas2d dot3) measures 1.5% SLOWER than HIGHEST at 4096
    # envs (9,897 vs 10,045 env-steps/s; parity 7.2e-07) — the per-solve
    # operand decompositions cost more than the saved MXU passes in this
    # VMEM-resident kernel. "high" therefore maps to the f32-exact path
    # here (unlike the 3D solver, where HIGH is +8.9% end to end); the
    # manual path stays selectable as "bf16x3" for bigger-nx grids where
    # the dense-transform share grows.
    _prec_name = poisson_precision or "highest"
    if _prec_name == "high":
        _prec_name = "highest"
    _kernel_prec = {"bf16x3": "high"}.get(_prec_name, _prec_name)
    _prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "bf16x3": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[_prec_name]
    poisson_bm = make_poisson_solver_2d_bm(nx, nz, dx, dz, dtype,
                                           precision=_prec)
    x_centers = grid.x_centers()

    # Batch-minor layout inside the substep loop: fields are (nx, nz[+1], E)
    # with the env axis E minor-most so it fills the TPU lane dimension
    # exactly (any E multiple of 128; nz=64 in the lane dim would pad to 128
    # and double every HBM transfer). X/Z stencils become major-axis slices
    # and sublane shifts; the Poisson solve is a batched (over nx) MXU matmul
    # contracting z with E in the lanes.
    X, Z = -3, -2

    def tendencies_bm(f: Fields2D, bottom_b: jax.Array):
        u, w, b = f.u, f.w, f.b

        # ---- u momentum ----------------------------------------------------
        u_c = st.interp_f2c_x(u, X)  # advecting u at centers
        flux_uu = u_c * st.recon_f2c_periodic(u, u_c, X)
        adv_u = st.ddx_c2f(flux_uu, dx, X)

        w_xf = st.interp_c2f_x(w, X)  # w at (x-face, z-face); walls stay 0
        flux_wu = w_xf * st.recon_c2f_z_fused(u, w_xf, Z)
        adv_u = adv_u + st.ddz_f2c(flux_wu, dz, Z)

        dphy_dx = st.ddx_c2f(f.p_hy, dx, X)
        lap_u = st.d2x_periodic(u, dx, X) + st.d2z_center_value_bc(
            u, dz, 0.0, 0.0, Z
        )
        gu = -adv_u - dphy_dx + nu * lap_u

        # ---- w momentum (buoyancy absorbed into pHY') ----------------------
        u_zf = st.interp_c2f_z_interior(u, Z)  # u at (x-face, z-face), walls 0
        flux_uw = u_zf * st.recon_c2f_periodic(w, u_zf, X)
        adv_w = st.ddx_f2c(flux_uw, dx, X)

        w_c = st.interp_f2c_z(w, Z)  # advecting w at centers
        flux_ww = w_c * st.recon_f2c_z_fused(w, w_c, Z)
        adv_w = adv_w + st.ddz_c2f_interior(flux_ww, dz, Z)

        lap_w = st.d2x_periodic(w, dx, X) + st.d2z_face_interior(w, dz, Z)
        gw = -adv_w + nu * lap_w
        # wall faces are held exactly at w = 0
        gw = st.zero_z_walls(gw, Z)

        # ---- buoyancy tracer ----------------------------------------------
        flux_ub = u * st.recon_c2f_periodic(b, u, X)
        adv_b = st.ddx_f2c(flux_ub, dx, X)
        flux_wb = w * st.recon_c2f_z_fused(b, w, Z)
        adv_b = adv_b + st.ddz_f2c(flux_wb, dz, Z)

        lap_b = st.d2x_periodic(b, dx, X) + st.d2z_center_value_bc(
            b, dz, bottom_b, min_b, Z
        )
        gb = -adv_b + kappa * lap_b

        return gu, gw, gb

    def project_bm(u, w, dt_stage):
        div = st.ddx_f2c(u, dx, X) + st.ddz_f2c(w, dz, Z)
        p = poisson_bm(div / dt_stage)
        u = u - dt_stage * st.ddx_c2f(p, dx, X)
        w = w - dt_stage * st.ddz_c2f_interior(p, dz, Z)
        return u, w, p

    if fused is None:
        fused = dtype == jnp.float32 and (
            jax.default_backend() not in ("cpu",) or fused_interpret
        )

    if fused:
        _fused_tend = make_tendencies_2d(
            nx, nz, dx, dz, params.nu, params.kappa, min_b,
            e_blk=e_blk, interpret=fused_interpret,
        )
        _fused_step = make_env_step_fused_2d(
            nx, nz, dx, dz, params.dt_solver,
            params.nu, params.kappa, min_b,
            params.substeps_per_env_step,
            e_blk=e_blk, interpret=fused_interpret,
            poisson_precision=_kernel_prec,
        )

    def substep_bm_fused(f: Fields2D, bottom_b: jax.Array) -> Fields2D:
        """Fused-kernel RK3 substep: Pallas tendencies + XLA update/projection."""
        dt = jnp.asarray(params.dt_solver, dtype)
        u, w, b = f.u, f.w, f.b
        p_nhs = f.p_nhs
        g_prev = None
        for m in range(3):
            gamma, zeta = RK3_GAMMA[m], RK3_ZETA[m]
            p_hy = _hydrostatic_pressure(b, dz, min_b, Z)
            gu, gw, gb = _fused_tend(u, w, b, p_hy, bottom_b)
            if m == 0:
                u = u + dt * gamma * gu
                w = w + dt * gamma * gw
                b = b + dt * gamma * gb
            else:
                u = u + dt * (gamma * gu + zeta * g_prev[0])
                w = w + dt * (gamma * gw + zeta * g_prev[1])
                b = b + dt * (gamma * gb + zeta * g_prev[2])
            g_prev = (gu, gw, gb)
            dt_stage = (gamma + zeta) * dt
            div = st.ddx_f2c(u, dx, X) + st.ddz_f2c(w, dz, Z)
            p_nhs = poisson_bm(div / dt_stage)
            u = u - dt_stage * st.ddx_c2f(p_nhs, dx, X)
            w = w - dt_stage * st.ddz_c2f_interior(p_nhs, dz, Z)
        p_hy = _hydrostatic_pressure(b, dz, min_b, Z)
        return Fields2D(u, w, b, p_hy, p_nhs)

    def substep_bm(f: Fields2D, bottom_b: jax.Array) -> Fields2D:
        """One full RK3 solver step of dt_solver (3 stages + projections).

        Operates on batch-minor (nx, nz[+1], E) fields; ``bottom_b`` is
        (nx, E) (or (nx, 1) broadcasting over envs).
        """
        if fused and f.u.shape[-1] % e_blk == 0:
            return substep_bm_fused(f, bottom_b)
        dt = jnp.asarray(params.dt_solver, dtype)
        u, w, b = f.u, f.w, f.b
        p_nhs = f.p_nhs
        g_prev = None
        p_hy = f.p_hy
        for m in range(3):
            gamma, zeta = RK3_GAMMA[m], RK3_ZETA[m]
            p_hy = _hydrostatic_pressure(b, dz, min_b, Z)
            gu, gw, gb = tendencies_bm(
                Fields2D(u, w, b, p_hy, p_nhs), bottom_b
            )
            if m == 0:
                u = u + dt * gamma * gu
                w = w + dt * gamma * gw
                b = b + dt * gamma * gb
            else:
                u = u + dt * (gamma * gu + zeta * g_prev[0])
                w = w + dt * (gamma * gw + zeta * g_prev[1])
                b = b + dt * (gamma * gb + zeta * g_prev[2])
            g_prev = (gu, gw, gb)
            dt_stage = (gamma + zeta) * dt
            u, w, p_nhs = project_bm(u, w, dt_stage)
        p_hy = _hydrostatic_pressure(b, dz, min_b, Z)
        return Fields2D(u, w, b, p_hy, p_nhs)

    # ---- batch-major <-> batch-minor shims --------------------------------

    def _to_bm(q: jax.Array, batch_shape) -> jax.Array:
        """(batch..., nx, nk) -> (nx, nk, E) with E = prod(batch)."""
        nb = len(batch_shape)
        q = q.reshape((-1,) + q.shape[nb:])
        return jnp.moveaxis(q, 0, -1)

    def _from_bm(q: jax.Array, batch_shape) -> jax.Array:
        q = jnp.moveaxis(q, -1, 0)
        return q.reshape(batch_shape + q.shape[1:])

    def _bottom_bm(bottom_b: jax.Array, batch_shape) -> jax.Array:
        """(batch..., nx) (broadcastable) -> (nx, E)."""
        b2 = jnp.broadcast_to(bottom_b, batch_shape + (nx,))
        return b2.reshape(-1, nx).T

    def substep(f: Fields2D, bottom_b: jax.Array) -> Fields2D:
        """Batch-major API: fields (batch..., nx, nz[+1]), bottom (batch..., nx)."""
        batch = f.u.shape[:-2]
        fbm = Fields2D(*(_to_bm(q, batch) for q in f))
        out = substep_bm(fbm, _bottom_bm(bottom_b, batch))
        return Fields2D(*(_from_bm(q, batch) for q in out))

    def env_step(f: Fields2D, action: jax.Array) -> Fields2D:
        """Advance by one environment step (heater_duration of sim time)."""
        action = jnp.asarray(action, dtype)
        bottom_b = heater_profile_2d(
            action,
            x_centers,
            grid.lx,
            params.n_heaters,
            params.heater_limit,
            rest_temperature=params.min_b + params.delta_b,
        ).astype(dtype)

        batch = f.u.shape[:-2]
        fbm = Fields2D(*(_to_bm(q, batch) for q in f))
        bottom_bm = _bottom_bm(bottom_b, batch)  # (nx, E)

        if fused and fbm.u.shape[-1] % e_blk == 0:
            # whole env step in one Pallas kernel; fields never leave VMEM
            u, w, b, p_nhs = _fused_step(fbm.u, fbm.w, fbm.b, bottom_bm)
            p_hy = _hydrostatic_pressure(b, dz, min_b, Z)
            fbm = Fields2D(u, w, b, p_hy, p_nhs)
        else:
            def body(carry, _):
                return substep_bm(carry, bottom_bm), None

            fbm, _ = jax.lax.scan(
                body, fbm, None, length=params.substeps_per_env_step
            )
        return Fields2D(*(_from_bm(q, batch) for q in fbm))

    def init_random(key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> Fields2D:
        """Random initial condition (reference sim/rbc_sim2D.jl:163-171).

        Linear conductive buoyancy profile plus Gaussian kick (clamped to the
        plate range), kick noise on the velocities; w wall faces zeroed.
        """
        ku, kw, kb = jax.random.split(key, 3)
        kick = params.random_kick
        shape_c = batch_shape + (nx, nz)
        shape_w = batch_shape + (nx, nz + 1)
        u = kick * jax.random.normal(ku, shape_c, dtype)
        w = kick * jax.random.normal(kw, shape_w, dtype)
        w = w.at[..., 0].set(0.0).at[..., -1].set(0.0)
        z_c = jnp.asarray(grid.z_centers(), dtype)
        profile = min_b + (grid.lz - z_c) * params.delta_b / 2.0
        b = jnp.clip(
            profile + kick * jax.random.normal(kb, shape_c, dtype),
            min_b,
            min_b + params.delta_b,
        )
        p_hy = _hydrostatic_pressure(b, dz, min_b)
        p_nhs = jnp.zeros(shape_c, dtype)
        return Fields2D(u, w, b.astype(dtype), p_hy, p_nhs)

    def heater_profile(action: jax.Array) -> jax.Array:
        return heater_profile_2d(
            jnp.asarray(action, dtype),
            x_centers,
            grid.lx,
            params.n_heaters,
            params.heater_limit,
            rest_temperature=params.min_b + params.delta_b,
        )

    return Solver2D(
        grid=grid,
        params=params,
        init_random=init_random,
        env_step=env_step,
        substep=substep,
        heater_profile=heater_profile,
    )
