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
from rbc_gym_tpu.ops.poisson import make_poisson_solver_2d
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


def _hydrostatic_pressure(b: jax.Array, dz: float, min_b: float) -> jax.Array:
    """pHY'(z) = -integral_z^Lz b dz', cumulative from the top at centers.

    Discretely (p[k] - p[k-1])/dz equals the face-interpolated buoyancy, so
    the w-momentum cancellation with the buoyancy term is exact.
    """
    b_face = 0.5 * (b[..., :-1] + b[..., 1:])  # interior faces 1..nz-1
    # top half-cell: face value is the Dirichlet top BC min_b
    increments = jnp.concatenate(
        [dz * b_face, jnp.full_like(b[..., :1], 0.5 * dz * min_b)], axis=-1
    )  # (..., nz): increment k spans [z_c[k-1] -> z_c[k]] except the last
    # p[k] = -(sum of increments k+1..nz-1 + top half) -> reverse cumsum
    rev = jnp.flip(increments, axis=-1)
    csum = jnp.cumsum(rev, axis=-1)
    return -jnp.flip(csum, axis=-1)


def make_solver2d(
    grid: Grid2D, params: SimParams2D, dtype=jnp.float32
) -> Solver2D:
    nx, nz = grid.nx, grid.nz
    dx, dz = grid.dx, grid.dz
    nu = jnp.asarray(params.nu, dtype)
    kappa = jnp.asarray(params.kappa, dtype)
    min_b = params.min_b

    poisson = make_poisson_solver_2d(nx, nz, dx, dz, dtype)
    x_centers = grid.x_centers()

    X = -2  # x axis is second-to-last throughout

    def tendencies(f: Fields2D, bottom_b: jax.Array):
        u, w, b = f.u, f.w, f.b

        # ---- u momentum ----------------------------------------------------
        u_c = st.interp_f2c_x(u, X)  # advecting u at centers
        flux_uu = u_c * st.recon_f2c_periodic(u, u_c, X)
        adv_u = st.ddx_c2f(flux_uu, dx, X)

        w_xf = st.interp_c2f_x(w, X)  # w at (x-face, z-face); walls stay 0
        flux_wu = w_xf * st.recon_c2f_z_fused(u, w_xf)
        adv_u = adv_u + st.ddz_f2c(flux_wu, dz)

        dphy_dx = st.ddx_c2f(f.p_hy, dx, X)
        lap_u = st.d2x_periodic(u, dx, X) + st.d2z_center_value_bc(u, dz, 0.0, 0.0)
        gu = -adv_u - dphy_dx + nu * lap_u

        # ---- w momentum (buoyancy absorbed into pHY') ----------------------
        u_zf = st.interp_c2f_z_interior(u)  # u at (x-face, z-face), walls 0
        flux_uw = u_zf * st.recon_c2f_periodic(w, u_zf, X)
        adv_w = st.ddx_f2c(flux_uw, dx, X)

        w_c = st.interp_f2c_z(w)  # advecting w at centers
        flux_ww = w_c * st.recon_f2c_z_fused(w, w_c)
        adv_w = adv_w + st.ddz_c2f_interior(flux_ww, dz)

        lap_w = st.d2x_periodic(w, dx, X) + st.d2z_face_interior(w, dz)
        gw = -adv_w + nu * lap_w
        # wall faces are held exactly at w = 0
        gw = gw.at[..., 0].set(0.0).at[..., -1].set(0.0)

        # ---- buoyancy tracer ----------------------------------------------
        flux_ub = u * st.recon_c2f_periodic(b, u, X)
        adv_b = st.ddx_f2c(flux_ub, dx, X)
        flux_wb = w * st.recon_c2f_z_fused(b, w)
        adv_b = adv_b + st.ddz_f2c(flux_wb, dz)

        lap_b = st.d2x_periodic(b, dx, X) + st.d2z_center_value_bc(
            b, dz, bottom_b, min_b
        )
        gb = -adv_b + kappa * lap_b

        return gu, gw, gb

    def project(u, w, dt_stage):
        div = st.ddx_f2c(u, dx, X) + st.ddz_f2c(w, dz)
        p = poisson(div / dt_stage)
        u = u - dt_stage * st.ddx_c2f(p, dx, X)
        w = w - dt_stage * st.ddz_c2f_interior(p, dz)
        return u, w, p

    def substep(f: Fields2D, bottom_b: jax.Array) -> Fields2D:
        """One full RK3 solver step of dt_solver (3 stages + projections)."""
        dt = jnp.asarray(params.dt_solver, dtype)
        u, w, b = f.u, f.w, f.b
        p_nhs = f.p_nhs
        g_prev = None
        p_hy = f.p_hy
        for m in range(3):
            gamma, zeta = RK3_GAMMA[m], RK3_ZETA[m]
            p_hy = _hydrostatic_pressure(b, dz, min_b)
            gu, gw, gb = tendencies(
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
            u, w, p_nhs = project(u, w, dt_stage)
        p_hy = _hydrostatic_pressure(b, dz, min_b)
        return Fields2D(u, w, b, p_hy, p_nhs)

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

        def body(carry, _):
            return substep(carry, bottom_b), None

        f, _ = jax.lax.scan(body, f, None, length=params.substeps_per_env_step)
        return f

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
