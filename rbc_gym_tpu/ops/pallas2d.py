"""Fused Pallas TPU kernel for the 2D RBC RK3 stage.

Behavioral target: one Runge-Kutta stage of the reference solver
(Oceananigans ``:RungeKutta3`` + ``UpwindBiasedFifthOrder`` advection,
sim/rbc_sim2D.jl:149-160) — numerically identical to the XLA stencil path in
``rbc_gym_tpu.sim.solver2d`` / ``rbc_gym_tpu.ops.stencils``.

Why a kernel: the XLA stencil path materializes ~15 intermediate
(nx, nz, E)-sized HBM buffers per stage (measured ~3.4 ms per advection
chain at E=4096), because concatenate-based halo pads break producer
fusion. This kernel keeps the ENTIRE (nx, nz) grid of an environment slab
resident in VMEM and runs every stencil, upwind select, and the RK update
in one pass: HBM traffic drops to the prognostic fields in + out.

Layout: batch-minor (nx, nz[+1], E) with the env axis minor so lanes are
always full; the grid is over env slabs only — no spatial halos exist at
all, since each program owns the full periodic-x / bounded-z domain for its
E_BLK environments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shared flux-form upwind implementations (axis-generic; the 2D (nx, nz, E)
# and 3D (nx, nz, ny, E) kernel layouts agree on x = axis 0, z = axis 1).
from rbc_gym_tpu.ops.pallas3d import (  # noqa: F401
    _c6_d5_flux,
    _uw_flux_periodic,
    _z_uw_flux,
)

DEFAULT_E_BLK = 128


# ---------------------------------------------------------------------------
# In-kernel stencil helpers (x = axis 0, z = axis 1, env = axis 2)
# ---------------------------------------------------------------------------


def _pad_x(q, before: int, after: int):
    """Periodic halo along the x (major) axis."""
    parts = []
    if before:
        parts.append(q[-before:])
    parts.append(q)
    if after:
        parts.append(q[:after])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else q


def _pad_z(q, before: int, after: int):
    """Zero pad along the z (sublane) axis."""
    zshape = list(q.shape)
    parts = []
    if before:
        zshape[1] = before
        parts.append(jnp.zeros(tuple(zshape), q.dtype))
    parts.append(q)
    if after:
        zshape[1] = after
        parts.append(jnp.zeros(tuple(zshape), q.dtype))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else q


def _zero_z_walls(q):
    mask = jax.lax.broadcasted_iota(jnp.int32, q.shape, dimension=1)
    interior = (mask > 0) & (mask < q.shape[1] - 1)
    return jnp.where(interior, q, 0.0)


def _uw_flux_x(q, vel, m: int):
    """vel * UB5 reconstruction along periodic x in flux form (the shared
    axis-generic C6-D5 implementation; x = axis 0 here as in 3D)."""
    return _uw_flux_periodic(q, vel, 0, m)


# ---------------------------------------------------------------------------
# The stage kernel
# ---------------------------------------------------------------------------


def _make_grid_ops(dx: float, dz: float):
    """Staggered-grid difference/interp helpers on (nx, nz[+1], E) arrays."""

    def ddx_c2f(q):  # (q[i] - q[i-1]) / dx, periodic
        p = _pad_x(q, 1, 0)
        return (p[1:] - p[:-1]) / dx

    def ddx_f2c(q):  # (q[i+1] - q[i]) / dx, periodic
        p = _pad_x(q, 0, 1)
        return (p[1:] - p[:-1]) / dx

    def interp_f2c_x(q):
        p = _pad_x(q, 0, 1)
        return 0.5 * (p[:-1] + p[1:])

    def interp_c2f_x(q):
        p = _pad_x(q, 1, 0)
        return 0.5 * (p[:-1] + p[1:])

    def d2x(q):
        p = _pad_x(q, 1, 1)
        n = q.shape[0]
        return (p[2 : n + 2] - 2.0 * q + p[0:n]) / (dx * dx)

    def ddz_f2c(q):
        return (q[:, 1:] - q[:, :-1]) / dz

    def ddz_c2f_interior(q):
        interior = (q[:, 1:] - q[:, :-1]) / dz
        return _pad_z(interior, 1, 1)

    def interp_f2c_z(q):
        return 0.5 * (q[:, :-1] + q[:, 1:])

    def interp_c2f_z_interior(q):
        interior = 0.5 * (q[:, :-1] + q[:, 1:])
        return _pad_z(interior, 1, 1)

    def d2z_value_bc(q, bottom_value, top_value):
        n = q.shape[1]
        if not isinstance(bottom_value, float):
            bottom_value = bottom_value[:, None]  # (nx, E) -> (nx, 1, E)
        ghost_b = 2.0 * bottom_value - q[:, 0:1]
        ghost_t = 2.0 * top_value - q[:, n - 1 : n]
        qm = jnp.concatenate([ghost_b, q[:, :-1]], axis=1)
        qp = jnp.concatenate([q[:, 1:], ghost_t], axis=1)
        return (qp - 2.0 * q + qm) / (dz * dz)

    def d2z_face_interior(q):
        interior = (q[:, 2:] - 2.0 * q[:, 1:-1] + q[:, :-2]) / (dz * dz)
        return _pad_z(interior, 1, 1)

    return locals()


def _tendencies(u, w, b, p_hy, bottom, *, nu, kappa, min_b, dx, dz):
    """All three UB5 flux-form tendency fields (numerics identical to the
    XLA stencil path in sim/solver2d.py tendencies_bm)."""
    o = _make_grid_ops(dx, dz)
    nz = u.shape[1]

    # ---- u momentum --------------------------------------------------------
    u_c = o["interp_f2c_x"](u)
    flux_uu = _uw_flux_x(u, u_c, m=1)
    adv_u = o["ddx_c2f"](flux_uu)

    w_xf = o["interp_c2f_x"](w)
    flux_wu = _z_uw_flux(u, w_xf, n_dst=nz + 1, split=0)
    adv_u = adv_u + o["ddz_f2c"](flux_wu)

    dphy_dx = o["ddx_c2f"](p_hy)
    lap_u = o["d2x"](u) + o["d2z_value_bc"](u, 0.0, 0.0)
    gu = -adv_u - dphy_dx + nu * lap_u

    # ---- w momentum (buoyancy absorbed into pHY') --------------------------
    u_zf = o["interp_c2f_z_interior"](u)
    flux_uw = _uw_flux_x(w, u_zf, m=0)
    adv_w = o["ddx_f2c"](flux_uw)

    w_c = o["interp_f2c_z"](w)
    flux_ww = _z_uw_flux(w, w_c, n_dst=nz, split=1)
    adv_w = adv_w + o["ddz_c2f_interior"](flux_ww)

    lap_w = o["d2x"](w) + o["d2z_face_interior"](w)
    gw = _zero_z_walls(-adv_w + nu * lap_w)

    # ---- buoyancy tracer ---------------------------------------------------
    flux_ub = _uw_flux_x(b, u, m=0)
    adv_b = o["ddx_f2c"](flux_ub)
    flux_wb = _z_uw_flux(b, w, n_dst=nz + 1, split=0)
    adv_b = adv_b + o["ddz_f2c"](flux_wb)

    lap_b = o["d2x"](b) + o["d2z_value_bc"](b, bottom, min_b)
    gb = -adv_b + kappa * lap_b

    return gu, gw, gb


def _tendency_kernel(
    refs,
    *,
    nu: float,
    kappa: float,
    min_b: float,
    dx: float,
    dz: float,
):
    """Compute all three UB5 tendency fields for one env slab in one pass.

    RK update / divergence / projection stay outside (cheap, XLA-fusable);
    keeping the kernel to 8 operands keeps double-buffered pipeline VMEM +
    the stencil scratch stack inside the 128 MiB budget.
    """
    (u_r, w_r, b_r, phy_r, bot_r, gu_r, gw_r, gb_r) = refs
    gu, gw, gb = _tendencies(
        u_r[:], w_r[:], b_r[:], phy_r[:], bot_r[:],
        nu=nu, kappa=kappa, min_b=min_b, dx=dx, dz=dz,
    )
    gu_r[:] = gu
    gw_r[:] = gw
    gb_r[:] = gb


# RK3 coefficients of the reference's :RungeKutta3 (sim/rbc_sim2D_api.jl),
# duplicated from sim/solver2d.py to avoid a circular import.
_RK3_GAMMA = (8.0 / 15.0, 5.0 / 12.0, 3.0 / 4.0)
_RK3_ZETA = (0.0, -17.0 / 60.0, -5.0 / 12.0)

_HI = jax.lax.Precision.HIGHEST


def _env_step_kernel(
    refs,
    *,
    n_substeps: int,
    dt: float,
    nu: float,
    kappa: float,
    min_b: float,
    dx: float,
    dz: float,
    poisson_precision=_HI,
    bf16x3: bool = False,
):
    """The ENTIRE env step (n_substeps x RK3 + projections) for one env slab.

    Fields stay resident in VMEM across every substep: HBM traffic for the
    whole heater interval is one read of (u, w, b) plus one write of
    (u, w, b, p_nhs) per slab. The Poisson solve runs on the MXU in-kernel
    (bit-identical contraction order to ops/poisson.make_poisson_solver_2d_bm);
    the hydrostatic pressure is a triangular-matrix z-contraction.
    """
    if bf16x3:
        (u_r, w_r, b_r, bot_r, f_r, g_r, inv_r, uhy_r,
         f_lo_r, g_lo_r, inv_lo_r,
         uo_r, wo_r, bo_r, pnhs_r) = refs
    else:
        (u_r, w_r, b_r, bot_r, f_r, g_r, inv_r, uhy_r,
         uo_r, wo_r, bo_r, pnhs_r) = refs

    bottom = bot_r[:]
    f_mat = f_r[:]        # (nx, nx) real-DFT analysis
    g_mat = g_r[:]        # (nx, nx) synthesis
    inv_rows = inv_r[:]   # (nx, nz, nz) per-mode vertical inverse (f, z)
    u_hy = uhy_r[:]       # (nz, nz) upper-triangular ones (j >= k)

    o = _make_grid_ops(dx, dz)
    nz = u_r.shape[1]

    def hydro(b):
        """pHY'[k] = -sum_{j>=k} inc[j]; matches solver2d._hydrostatic_pressure
        up to f32 summation order (matmul vs cumulative sum)."""
        b_face = 0.5 * (b[:, :-1] + b[:, 1:])
        top = jnp.full_like(b[:, 0:1], 0.5 * dz * min_b)
        inc = jnp.concatenate([dz * b_face, top], axis=1)  # (nx, nz, E)
        t = jax.lax.dot_general(
            u_hy, inc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )  # (k, nx, E)
        return -jnp.transpose(t, (1, 0, 2))

    if bf16x3:
        # Manual 3-pass bf16x3 spectral solve (Mosaic's dot_general lowers
        # only DEFAULT and HIGHEST, so jax's HIGH is unavailable
        # in-kernel): the setup-constant transform matrices come pre-split
        # into bf16-exact hi + f32 lo residual refs; the dynamic operand
        # splits in-kernel. A.B ~ Ahi.Bhi + Ahi.Blo + Alo.Bhi (the lo.lo
        # term, ~2^-16 relative, is dropped) — three 1-pass bf16 MXU dots
        # with f32 accumulation vs HIGHEST's 6 passes. Accuracy matches
        # the XLA path's Precision.HIGH (same decomposition).
        f_lo = f_lo_r[:]
        g_lo = g_lo_r[:]
        inv_lo = inv_lo_r[:]
        _DEF = jax.lax.Precision.DEFAULT

        def dot3(a_hi, a_lo, b, contract, batch=((), ())):
            dn = (contract, batch)
            b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
            b_lo = b - b_hi
            return (
                jax.lax.dot_general(a_hi, b_hi, dn,
                                    preferred_element_type=jnp.float32,
                                    precision=_DEF)
                + jax.lax.dot_general(a_hi, b_lo, dn,
                                      preferred_element_type=jnp.float32,
                                      precision=_DEF)
                + jax.lax.dot_general(a_lo, b_hi, dn,
                                      preferred_element_type=jnp.float32,
                                      precision=_DEF)
            )

        def poisson(rhs):
            rhat = dot3(f_mat, f_lo, rhs, ((1,), (0,)))
            phat = dot3(inv_rows, inv_lo, rhat, ((2,), (1,)),
                        batch=((0,), (0,)))
            return dot3(g_mat, g_lo, phat, ((1,), (0,)))
    else:
        def poisson(rhs):
            # MXU precision for the spectral solve only; the hydrostatic
            # contraction above stays exact.
            rhat = jax.lax.dot_general(
                f_mat, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=poisson_precision,
            )
            phat = jax.lax.dot_general(
                inv_rows, rhat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=poisson_precision,
            )
            return jax.lax.dot_general(
                g_mat, phat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=poisson_precision,
            )

    def substep(carry, _):
        u, w, b, p_nhs = carry
        g_prev = None
        for m in range(3):
            gamma, zeta = _RK3_GAMMA[m], _RK3_ZETA[m]
            p_hy = hydro(b)
            gu, gw, gb = _tendencies(
                u, w, b, p_hy, bottom,
                nu=nu, kappa=kappa, min_b=min_b, dx=dx, dz=dz,
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
            div = o["ddx_f2c"](u) + o["ddz_f2c"](w)
            p_nhs = poisson(div / dt_stage)
            u = u - dt_stage * o["ddx_c2f"](p_nhs)
            w = w - dt_stage * o["ddz_c2f_interior"](p_nhs)
        return (u, w, b, p_nhs)

    init = (u_r[:], w_r[:], b_r[:], jnp.zeros_like(u_r[:]))
    u, w, b, p_nhs = jax.lax.fori_loop(
        0, n_substeps, lambda i, c: substep(c, i), init
    )
    uo_r[:] = u
    wo_r[:] = w
    bo_r[:] = b
    pnhs_r[:] = p_nhs


@functools.lru_cache(maxsize=None)
def make_env_step_fused_2d(
    nx: int,
    nz: int,
    dx: float,
    dz: float,
    dt: float,
    nu: float,
    kappa: float,
    min_b: float,
    n_substeps: int,
    e_blk: int = DEFAULT_E_BLK,
    interpret: bool = False,
    # 127 MiB like the 3D kernels: with grid >= 2 Mosaic double-buffers the
    # in/out blocks, and the pipelined whole-step kernel needs 121.04 MiB —
    # over the old 120 MiB cap (observed as a scoped-vmem OOM at E=256
    # inside the PPO training program; E=128 ran grid=1 and fit).
    vmem_limit_mb: int = 127,
    poisson_precision: str = "highest",
):
    """Build the whole-env-step fused function.

    Returns ``step(u, w, b, bottom)`` over batch-minor (nx, nz[+1], E)
    fields -> (u', w', b', p_nhs') after ``n_substeps`` RK3 substeps.
    """
    # Setup-time constants (float64 numpy, cast to f32 once).
    from rbc_gym_tpu.ops.poisson import (
        _dft_eigenvalues,
        _real_dft_matrices,
        _vertical_inverses,
    )

    f_mat, g_mat, row_modes = _real_dft_matrices(nx)
    lams = _dft_eigenvalues(nx, dx)
    inv_rows = np.swapaxes(_vertical_inverses(lams, nz, dz)[row_modes], -1, -2)
    u_hy = np.triu(np.ones((nz, nz)))  # [k, j] = 1 where j >= k

    bf16x3 = poisson_precision == "high"
    f32 = jnp.float32
    f_mat = jnp.asarray(f_mat, f32)
    g_mat = jnp.asarray(g_mat, f32)
    inv_rows = jnp.asarray(inv_rows, f32)
    if bf16x3:
        # pre-split the setup constants: hi is bf16-exact in f32, lo is
        # the f32 residual — see the kernel's dot3
        def _split(a):
            hi = a.astype(jnp.bfloat16).astype(f32)
            return hi, a - hi

        f_mat, f_lo = _split(f_mat)
        g_mat, g_lo = _split(g_mat)
        inv_rows, inv_lo = _split(inv_rows)
        extra_consts = (f_lo, g_lo, inv_lo)
    else:
        extra_consts = ()
    consts = (
        f_mat,
        g_mat,
        inv_rows,
        jnp.asarray(u_hy, f32),
    ) + extra_consts

    kernel = functools.partial(
        lambda *refs, **kw: _env_step_kernel(refs, **kw),
        n_substeps=n_substeps,
        dt=dt,
        nu=nu,
        kappa=kappa,
        min_b=min_b,
        dx=dx,
        dz=dz,
        poisson_precision={
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGHEST,  # unused when bf16x3
            "default": jax.lax.Precision.DEFAULT,
        }[poisson_precision],
        bf16x3=bf16x3,
    )

    def field_spec(nk):
        return pl.BlockSpec(
            (nx, nk, e_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM
        )

    in_specs = [
        field_spec(nz),      # u
        field_spec(nz + 1),  # w
        field_spec(nz),      # b
        pl.BlockSpec((nx, e_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        const_spec((nx, nx)),
        const_spec((nx, nx)),
        const_spec((nx, nz, nz)),
        const_spec((nz, nz)),
    ] + (
        [const_spec((nx, nx)), const_spec((nx, nx)),
         const_spec((nx, nz, nz))]
        if bf16x3 else []
    )
    out_specs = (
        field_spec(nz),      # u'
        field_spec(nz + 1),  # w'
        field_spec(nz),      # b'
        field_spec(nz),      # p_nhs'
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
    )

    def step(u, w, b, bottom):
        e = u.shape[-1]
        if e % e_blk:
            raise ValueError(f"env axis {e} not a multiple of e_blk {e_blk}")
        dtype = u.dtype
        out_shape = (
            jax.ShapeDtypeStruct((nx, nz, e), dtype),
            jax.ShapeDtypeStruct((nx, nz + 1, e), dtype),
            jax.ShapeDtypeStruct((nx, nz, e), dtype),
            jax.ShapeDtypeStruct((nx, nz, e), dtype),
        )
        return pl.pallas_call(
            kernel,
            grid=(e // e_blk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(u, w, b, bottom, *consts)

    return step


@functools.lru_cache(maxsize=None)
def make_tendencies_2d(
    nx: int,
    nz: int,
    dx: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    e_blk: int = DEFAULT_E_BLK,
    interpret: bool = False,
    vmem_limit_mb: int = 112,
):
    """Build the fused tendency function.

    Returns ``tend(u, w, b, p_hy, bottom)`` over batch-minor fields
    (nx, nz[+1], E), E a multiple of ``e_blk`` -> (gu, gw, gb).
    """

    kernel = functools.partial(
        lambda *refs, **kw: _tendency_kernel(refs, **kw),
        nu=nu,
        kappa=kappa,
        min_b=min_b,
        dx=dx,
        dz=dz,
    )

    def field_spec(nk):
        return pl.BlockSpec(
            (nx, nk, e_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    bottom_spec = pl.BlockSpec(
        (nx, e_blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    in_specs = [
        field_spec(nz),      # u
        field_spec(nz + 1),  # w
        field_spec(nz),      # b
        field_spec(nz),      # p_hy
        bottom_spec,         # bottom_b
    ]
    out_specs = (
        field_spec(nz),      # gu
        field_spec(nz + 1),  # gw
        field_spec(nz),      # gb
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
    )

    def tend(u, w, b, p_hy, bottom):
        e = u.shape[-1]
        if e % e_blk:
            raise ValueError(f"env axis {e} not a multiple of e_blk {e_blk}")
        dtype = u.dtype
        out_shape = (
            jax.ShapeDtypeStruct((nx, nz, e), dtype),
            jax.ShapeDtypeStruct((nx, nz + 1, e), dtype),
            jax.ShapeDtypeStruct((nx, nz, e), dtype),
        )
        return pl.pallas_call(
            kernel,
            grid=(e // e_blk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(u, w, b, p_hy, bottom)

    return tend
