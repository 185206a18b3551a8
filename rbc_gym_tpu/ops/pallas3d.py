"""Fused Pallas TPU kernels for the 3D RBC RK3 stage.

Behavioral target: the reference 3D solver (Oceananigans ``:RungeKutta3`` +
``UpwindBiasedFifthOrder``, free-fall time units, sim/rbc_sim3D.jl) —
numerically equivalent to the XLA batch-minor path in
``rbc_gym_tpu.sim.solver3d`` (same stencils and RK coefficients; different
but exact float32 summation orders for the hydrostatic suffix sum).

Design (and how it differs from the 2D kernel, ops/pallas2d.py):

* Layout (nx, nz[+1], ny, E): x and z are UNTILED leading axes (stencil
  taps are cheap slices and the w field's nz+1 rows cost no tile padding),
  y sits in the sublanes, and the env axis fills the lanes.
* Per-FIELD stage kernels (tendency + RK update), not a whole-step kernel:
  the 128 MiB VMEM bounds env slabs to 64 lanes for this grid, Mosaic's
  dense-matmul lowering requires full 128-lane operands (so the Poisson
  solve cannot live in a 64-lane kernel), and a monolithic all-fields
  stage body spills ~110 MB of vector registers. The Poisson solve runs
  outside in XLA (ops/poisson.make_poisson_solver_3d_bm) as full-lane MXU
  matmuls — it is ~7%% of stage time in the op profile; the stencil work
  these kernels fuse is the other ~85%%.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rbc_gym_tpu.ops.stencils import (
    _UB1_LEFT,
    _UB1_RIGHT,
    _UB3_LEFT,
    _UB3_RIGHT,
    _UB5_LEFT,
    _UB5_RIGHT,
)

DEFAULT_E_BLK_3D = 128

# RK3 coefficients (reference :RungeKutta3), duplicated from sim/solver2d.py
# to avoid a circular import.
_RK3_GAMMA = (8.0 / 15.0, 5.0 / 12.0, 3.0 / 4.0)
_RK3_ZETA = (0.0, -17.0 / 60.0, -5.0 / 12.0)

_HI = jax.lax.Precision.HIGHEST

# kernel array axes: (x, z, y, env)
_AX, _AZ, _AY = 0, 1, 2


def _slice(q, axis, start, stop):
    return jax.lax.slice_in_dim(q, start, stop, axis=axis)


def _pad_periodic(q, axis, before, after):
    n = q.shape[axis]
    parts = []
    if before:
        parts.append(_slice(q, axis, n - before, n))
    parts.append(q)
    if after:
        parts.append(_slice(q, axis, 0, after))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else q


def _pad_zeros(q, axis, before, after):
    shape = list(q.shape)
    parts = []
    if before:
        shape[axis] = before
        parts.append(jnp.zeros(tuple(shape), q.dtype))
    parts.append(q)
    if after:
        shape[axis] = after
        parts.append(jnp.zeros(tuple(shape), q.dtype))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else q


def _upwind_periodic(q, vel, axis, m):
    """UB5 upwind reconstruction along a periodic axis (x or y); matches
    stencils._upwind_periodic.

    VMEM note: each biased sum accumulates tap-by-tap and the two sides are
    evaluated sequentially, so at most (pad + accumulator + one tap + one
    side) slabs are live — Mosaic materializes every intermediate value, so
    expression shape directly controls the kernel's VMEM peak.
    """
    n = q.shape[axis]
    before, after = 3 - m, 2 + m
    p = _pad_periodic(q, axis, before, after)

    def tap(off):
        o = before + m + off
        return _slice(p, axis, o, o + n)

    left = 2 * tap(-3)
    left = left - 13 * tap(-2)
    left = left + 47 * tap(-1)
    left = left + 27 * tap(0)
    left = (left - 3 * tap(1)) / 60
    out = jnp.where(vel > 0, left, 0.0)
    right = 2 * tap(2)
    right = right - 13 * tap(1)
    right = right + 47 * tap(0)
    right = right + 27 * tap(-1)
    right = (right - 3 * tap(-2)) / 60
    return jnp.where(vel > 0, out, right)


def _z_candidate(q, n_dst, split, stencil):
    p = _pad_zeros(q, _AZ, 3, 3)

    def tap(off):
        s = 3 + split + off
        return _slice(p, _AZ, s, s + n_dst)

    acc = None
    for off, c in stencil:
        term = c * tap(off)
        acc = term if acc is None else acc + term
    return acc


def _stencil_fit_range(stencil, n_src: int) -> Tuple[int, int]:
    """Inclusive range of m for which every tap m+off lies in [0, n_src)."""
    offs = [off for off, _ in stencil]
    return -min(offs), n_src - 1 - max(offs)


def _z_row_mask(lo_m: int, hi_m: int, split: int, shape):
    """Boolean mask over z rows j where the stencil (at m = j + split) fits.

    Built from an in-kernel iota (Pallas forbids captured array constants)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=_AZ)
    return (rows >= lo_m - split) & (rows <= hi_m - split)


def _z_upwind(q, vel, n_dst, split):
    """Upwind z reconstruction with UB5->UB3->UB1 wall order reduction;
    matches stencils._z_upwind (same fits-in-range ladder rule).

    Evaluated side-by-side sequentially and candidate-by-candidate (see
    the VMEM note on _upwind_periodic)."""
    n_src = q.shape[_AZ]
    shape = (q.shape[0], n_dst) + q.shape[2:]

    def pick(biased):
        s5, s3, s1 = {
            "left": (_UB5_LEFT, _UB3_LEFT, _UB1_LEFT),
            "right": (_UB5_RIGHT, _UB3_RIGHT, _UB1_RIGHT),
        }[biased]
        lo5, hi5 = _stencil_fit_range(s5, n_src)
        lo3, hi3 = _stencil_fit_range(s3, n_src)
        m5 = _z_row_mask(lo5, hi5, split, shape)
        out = jnp.where(m5, _z_candidate(q, n_dst, split, s5), 0.0)
        m3 = _z_row_mask(lo3, hi3, split, shape) & ~m5
        out = jnp.where(m3, _z_candidate(q, n_dst, split, s3), out)
        rest = ~(m5 | m3)
        return jnp.where(rest, _z_candidate(q, n_dst, split, s1), out)

    out = jnp.where(vel > 0, pick("left"), 0.0)
    return jnp.where(vel > 0, out, pick("right"))


def _c6_d5_flux(tap, vel):
    """Upwind-biased 5th-order FLUX via the central-plus-dissipation
    factorization: UB5(q, v) = C6(q) - sign(v) * D5(q)/60, so
    v * UB5 = v * C6 - |v| * D5/60 — one 6-tap stencil pair instead of two
    5-tap branches plus selects (taps at offsets -3..2 around the face).

    Algebra check against stencils._UB5_LEFT/(RIGHT): C6 -(+) D5/60 =
    (2,-13,47,27,-3,0)/60 ((0,-3,27,47,-13,2)/60)."""
    s0 = tap(0) + tap(-1)
    s1 = tap(1) + tap(-2)
    s2 = tap(2) + tap(-3)
    c6 = (37.0 / 60.0) * s0 - (8.0 / 60.0) * s1 + (1.0 / 60.0) * s2
    d0 = tap(0) - tap(-1)
    d1 = tap(1) - tap(-2)
    d2 = tap(2) - tap(-3)
    d5 = (10.0 / 60.0) * d0 - (5.0 / 60.0) * d1 + (1.0 / 60.0) * d2
    return vel * c6 - jnp.abs(vel) * d5


def _uw_flux_periodic(q, vel, axis, m):
    """vel * UB5-reconstruction along a periodic axis in flux form; matches
    vel * _upwind_periodic(q, vel, axis, m) up to f32 summation order."""
    n = q.shape[axis]
    before = 3 - m
    p = _pad_periodic(q, axis, before, 2 + m)

    def tap(off):
        o = before + m + off
        return _slice(p, axis, o, o + n)

    return _c6_d5_flux(tap, vel)


def _z_row_flux(p, vel, j, split, n_src):
    """One output row of the wall ladder: per-side first-fitting candidate
    (UB5 -> UB3 -> UB1, UB1 as zero-padded fallback), exactly the
    stencils._z_upwind rule, evaluated on a single z row slice."""
    m = j + split
    v = _slice(vel, _AZ, j, j + 1)

    def first_fit(cands):
        for st_ in cands[:-1]:
            lo, hi = _stencil_fit_range(st_, n_src)
            if lo <= m <= hi:
                return st_
        return cands[-1]

    def cand(st_):
        acc = None
        for off, c in st_:
            t = c * _slice(p, _AZ, 3 + m + off, 3 + m + off + 1)
            acc = t if acc is None else acc + t
        return acc

    left = cand(first_fit((_UB5_LEFT, _UB3_LEFT, _UB1_LEFT)))
    right = cand(first_fit((_UB5_RIGHT, _UB3_RIGHT, _UB1_RIGHT)))
    return v * jnp.where(v > 0, left, right)


def _z_uw_flux(q, vel, n_dst, split):
    """vel * upwind z reconstruction in flux form with UB5->UB3->UB1 wall
    order reduction; row-for-row equal to vel * _z_upwind(q, vel, ...) up
    to f32 summation order. Interior rows (both-side UB5 fits:
    m = j + split in [3, n_src-3]) use the C6 - |v| D5 factorization in one
    full-width pass; the few wall rows are patched via narrow row slices
    (1/nz of the slab each) instead of full-slab candidates + masks."""
    n_src = q.shape[_AZ]
    p = _pad_zeros(q, _AZ, 3, 3)
    lo_j = max(0, 3 - split)
    hi_j = min(n_dst - 1, n_src - 3 - split)  # inclusive

    rows = [_z_row_flux(p, vel, j, split, n_src) for j in range(0, lo_j)]
    if hi_j >= lo_j:
        n_int = hi_j - lo_j + 1
        v_int = _slice(vel, _AZ, lo_j, lo_j + n_int)

        def tap(off):
            s = 3 + split + off + lo_j
            return _slice(p, _AZ, s, s + n_int)

        rows.append(_c6_d5_flux(tap, v_int))
    rows += [
        _z_row_flux(p, vel, j, split, n_src) for j in range(hi_j + 1, n_dst)
    ]
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=_AZ)


def _make_grid_ops(dx: float, dy: float, dz: float):
    """Staggered-grid helpers on (nx, nz[+1], ny, E) arrays."""

    def ddh_c2f(q, axis, d):  # (q[i] - q[i-1]) / d, periodic
        n = q.shape[axis]
        p = _pad_periodic(q, axis, 1, 0)
        return (_slice(p, axis, 1, n + 1) - _slice(p, axis, 0, n)) / d

    def ddh_f2c(q, axis, d):  # (q[i+1] - q[i]) / d, periodic
        n = q.shape[axis]
        p = _pad_periodic(q, axis, 0, 1)
        return (_slice(p, axis, 1, n + 1) - _slice(p, axis, 0, n)) / d

    def interp_f2c(q, axis):
        n = q.shape[axis]
        p = _pad_periodic(q, axis, 0, 1)
        return 0.5 * (_slice(p, axis, 0, n) + _slice(p, axis, 1, n + 1))

    def interp_c2f(q, axis):
        n = q.shape[axis]
        p = _pad_periodic(q, axis, 1, 0)
        return 0.5 * (_slice(p, axis, 0, n) + _slice(p, axis, 1, n + 1))

    def d2h(q, axis, d):
        n = q.shape[axis]
        p = _pad_periodic(q, axis, 1, 1)
        qm = _slice(p, axis, 0, n)
        qp = _slice(p, axis, 2, n + 2)
        return (qp - 2.0 * q + qm) / (d * d)

    def ddz_f2c(q):
        n = q.shape[_AZ]
        return (_slice(q, _AZ, 1, n) - _slice(q, _AZ, 0, n - 1)) / dz

    def ddz_c2f_interior(q):
        n = q.shape[_AZ]
        interior = (_slice(q, _AZ, 1, n) - _slice(q, _AZ, 0, n - 1)) / dz
        return _pad_zeros(interior, _AZ, 1, 1)

    def interp_f2c_z(q):
        n = q.shape[_AZ]
        return 0.5 * (_slice(q, _AZ, 0, n - 1) + _slice(q, _AZ, 1, n))

    def interp_c2f_z_interior(q):
        n = q.shape[_AZ]
        interior = 0.5 * (_slice(q, _AZ, 0, n - 1) + _slice(q, _AZ, 1, n))
        return _pad_zeros(interior, _AZ, 1, 1)

    def d2z_value_bc(q, bottom_value, top_value):
        n = q.shape[_AZ]
        q0 = _slice(q, _AZ, 0, 1)
        qn = _slice(q, _AZ, n - 1, n)
        if not isinstance(bottom_value, float):
            bottom_value = bottom_value[:, None]  # (nx, ny, E) -> (nx,1,ny,E)
        ghost_b = 2.0 * bottom_value - q0
        ghost_t = 2.0 * top_value - qn
        qm = jnp.concatenate([ghost_b, _slice(q, _AZ, 0, n - 1)], axis=_AZ)
        qp = jnp.concatenate([_slice(q, _AZ, 1, n), ghost_t], axis=_AZ)
        return (qp - 2.0 * q + qm) / (dz * dz)

    def d2z_face_interior(q):
        n = q.shape[_AZ]
        qm = _slice(q, _AZ, 0, n - 2)
        qc = _slice(q, _AZ, 1, n - 1)
        qp = _slice(q, _AZ, 2, n)
        interior = (qp - 2.0 * qc + qm) / (dz * dz)
        return _pad_zeros(interior, _AZ, 1, 1)

    def zero_z_walls(q):
        n = q.shape[_AZ]
        return _pad_zeros(_slice(q, _AZ, 1, n - 1), _AZ, 1, 1)

    return {
        "ddx_c2f": lambda q: ddh_c2f(q, _AX, dx),
        "ddx_f2c": lambda q: ddh_f2c(q, _AX, dx),
        "ddy_c2f": lambda q: ddh_c2f(q, _AY, dy),
        "ddy_f2c": lambda q: ddh_f2c(q, _AY, dy),
        "interp_f2c_x": lambda q: interp_f2c(q, _AX),
        "interp_c2f_x": lambda q: interp_c2f(q, _AX),
        "interp_f2c_y": lambda q: interp_f2c(q, _AY),
        "interp_c2f_y": lambda q: interp_c2f(q, _AY),
        "d2x": lambda q: d2h(q, _AX, dx),
        "d2y": lambda q: d2h(q, _AY, dy),
        "ddz_f2c": ddz_f2c,
        "ddz_c2f_interior": ddz_c2f_interior,
        "interp_f2c_z": interp_f2c_z,
        "interp_c2f_z_interior": interp_c2f_z_interior,
        "d2z_value_bc": d2z_value_bc,
        "d2z_face_interior": d2z_face_interior,
        "zero_z_walls": zero_z_walls,
    }


def _hydro(b, nz, dz, min_b):
    """p_hy[k] = -sum_{j>=k} inc[j]; suffix sum via doubling shifts
    (solver2d._hydrostatic_pressure up to f32 summation order)."""
    b_face = 0.5 * (_slice(b, _AZ, 0, nz - 1) + _slice(b, _AZ, 1, nz))
    top = jnp.full_like(_slice(b, _AZ, 0, 1), 0.5 * dz * min_b)
    acc = jnp.concatenate([dz * b_face, top], axis=_AZ)
    s = 1
    while s < nz:
        shifted = _pad_zeros(_slice(acc, _AZ, s, nz), _AZ, 0, s)
        acc = acc + shifted
        s *= 2
    return -acc



def _tend_u(emit, u, v, w, p_hy, o, nu):
    """u-momentum tendency at (fx, cy, cz); mirror of solver3d.tendencies_bm.

    ``emit(term)`` accumulates into the output ref between terms: ref
    writes are ordering barriers for Mosaic, which otherwise interleaves
    the three directions' stencil chains and spills tens of MB of vector
    registers (same for the other tendencies below).
    """
    nz = u.shape[_AZ]
    u_cx = o["interp_f2c_x"](u)
    emit(o["ddx_c2f"](u_cx * _upwind_periodic(u, u_cx, _AX, m=1)))
    v_fxfy = o["interp_c2f_x"](v)
    emit(o["ddy_f2c"](v_fxfy * _upwind_periodic(u, v_fxfy, _AY, m=0)))
    w_fx = o["interp_c2f_x"](w)
    emit(o["ddz_f2c"](w_fx * _z_upwind(u, w_fx, n_dst=nz + 1, split=0)))
    def finish(neg_acc, emit):
        emit(-o["ddx_c2f"](p_hy))
        emit(nu * o["d2x"](u))
        emit(nu * o["d2y"](u))
        emit(nu * o["d2z_value_bc"](u, 0.0, 0.0))

    return finish


def _tend_v(emit, u, v, w, p_hy, o, nu):
    """v-momentum tendency at (cx, fy, cz)."""
    nz = v.shape[_AZ]
    u_fxfy = o["interp_c2f_y"](u)
    emit(o["ddx_f2c"](u_fxfy * _upwind_periodic(v, u_fxfy, _AX, m=0)))
    v_cy = o["interp_f2c_y"](v)
    emit(o["ddy_c2f"](v_cy * _upwind_periodic(v, v_cy, _AY, m=1)))
    w_fy = o["interp_c2f_y"](w)
    emit(o["ddz_f2c"](w_fy * _z_upwind(v, w_fy, n_dst=nz + 1, split=0)))
    def finish(neg_acc, emit):
        emit(-o["ddy_c2f"](p_hy))
        emit(nu * o["d2x"](v))
        emit(nu * o["d2y"](v))
        emit(nu * o["d2z_value_bc"](v, 0.0, 0.0))

    return finish


def _tend_w(emit, u, v, w, o, nu):
    """w-momentum tendency at (cx, cy, fz); buoyancy absorbed into pHY'."""
    u_fz = o["interp_c2f_z_interior"](u)
    emit(o["ddx_f2c"](u_fz * _upwind_periodic(w, u_fz, _AX, m=0)))
    v_fz = o["interp_c2f_z_interior"](v)
    emit(o["ddy_f2c"](v_fz * _upwind_periodic(w, v_fz, _AY, m=0)))
    w_cz = o["interp_f2c_z"](w)
    emit(o["ddz_c2f_interior"](
        w_cz * _z_upwind(w, w_cz, n_dst=w.shape[_AZ] - 1, split=1)
    ))
    def finish(neg_acc, emit):
        emit(nu * o["d2x"](w))
        emit(nu * o["d2y"](w))
        emit(nu * o["d2z_face_interior"](w))
        emit(None, zero_walls=True)

    return finish


def _tend_b(emit, u, v, w, b, bottom, o, kappa, min_b):
    """Buoyancy tracer tendency at centers."""
    nz = b.shape[_AZ]
    emit(o["ddx_f2c"](u * _upwind_periodic(b, u, _AX, m=0)))
    emit(o["ddy_f2c"](v * _upwind_periodic(b, v, _AY, m=0)))
    emit(o["ddz_f2c"](w * _z_upwind(b, w, n_dst=nz + 1, split=0)))
    def finish(neg_acc, emit):
        emit(kappa * o["d2x"](b))
        emit(kappa * o["d2y"](b))
        emit(kappa * o["d2z_value_bc"](b, bottom, min_b))

    return finish


def _field_stage_kernel(
    refs,
    *,
    field: str,
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
):
    """One field's UB5 tendency for one env slab.

    The monolithic whole-stage kernel spills ~110 MB of vector registers to
    VMEM under Mosaic's register allocator (the four tendency chains give
    the scheduler too much simultaneously-live state), so the stage is
    split per prognostic field, and each kernel computes ONLY the tendency
    g_f — the RK update f' = f + dt (gamma g_f + zeta g_f_prev) is pure
    elementwise and XLA fuses it into a single pass, so keeping it here
    would cost two more 8 MB VMEM windows (f'-out and g_prev-in) for no
    HBM saving. The hydrostatic pressure, Poisson solve, divergence, and
    velocity correction also stay in XLA (solver3d): the dense modal
    matmuls only lower on full 128-lane operands.

    Inputs are tailored per field (u/v read p_hy, b reads the heater plate,
    w reads neither), and every tendency term is accumulated into the
    output ref as it is produced — ref writes are ordering barriers that
    stop Mosaic from interleaving the direction chains (each barrier
    removed costs ~2 MB of spill slots).
    """
    o = _make_grid_ops(dx, dy, dz)

    def make_emit(g_r):
        state = {"first": True}

        def emit(term, zero_walls=False):
            if zero_walls:
                g_r[0] = o["zero_z_walls"](g_r[0])
            elif state["first"]:
                g_r[0] = term
                state["first"] = False
            else:
                g_r[0] = g_r[0] + term

        return emit

    if field == "u":
        (u_r, v_r, w_r, phy_r, g_r) = refs
        u, v, w = u_r[0], v_r[0], w_r[0]
        emit = make_emit(g_r)
        finish = _tend_u(emit, u, v, w, phy_r[0], o, nu)
    elif field == "v":
        (u_r, v_r, w_r, phy_r, g_r) = refs
        u, v, w = u_r[0], v_r[0], w_r[0]
        emit = make_emit(g_r)
        finish = _tend_v(emit, u, v, w, phy_r[0], o, nu)
    elif field == "w":
        (u_r, v_r, w_r, g_r) = refs
        u, v, w = u_r[0], v_r[0], w_r[0]
        emit = make_emit(g_r)
        finish = _tend_w(emit, u, v, w, o, nu)
    else:
        (u_r, v_r, w_r, b_r, bot_r, g_r) = refs
        u, v, w, b = u_r[0], v_r[0], w_r[0], b_r[0]
        emit = make_emit(g_r)
        finish = _tend_b(emit, u, v, w, b, bot_r[0], o, kappa, min_b)

    g_r[0] = -g_r[0]        # the ref held +advection; tendency is -adv + ...
    finish(None, emit)      # diffusion/forcing terms, emitted stepwise


# ---------------------------------------------------------------------------
# Whole-stage x-blocked kernel
#
# All four tendencies in ONE kernel per (env-slab, x-block) grid step. The
# monolithic full-x stage kernel spills ~110 MB of vector registers; blocking
# x bounds the simultaneously-live stencil state to a (x_blk + 6)-wide slab
# (UB5 total radius is exactly 3) while keeping full 128 lanes. Each field is
# passed THREE times with shifted index_maps (prev/center/next x-block,
# periodic modulo) so the kernel sees an x-halo without any unsupported
# gather; the halo views are concatenated in-VMEM to a (x_blk+6, nk, ny, E)
# extended slab and all x-stencils run in VALID mode on it. See
# docs/PERF_NOTES_3D.md.
#
# Valid-mode x ops track (array, lo) where ``lo`` is the extended-frame
# coordinate of element 0; the center output block occupies [3, 3 + x_blk).
# ---------------------------------------------------------------------------


def _xa_align(p, q):
    """Crop two (array, lo) pairs to their common x range."""
    (a, la), (b, lb) = p, q
    lo = max(la, lb)
    hi = min(la + a.shape[0], lb + b.shape[0])
    return _slice(a, _AX, lo - la, hi - la), _slice(b, _AX, lo - lb, hi - lb), lo



def _xa_sub(p, q):
    a, b, lo = _xa_align(p, q)
    return a - b, lo


def _xv_dd_c2f(p, d):  # out[i] = (q[i] - q[i-1]) / d
    a, lo = p
    return (_slice(a, _AX, 1, a.shape[0]) - _slice(a, _AX, 0, a.shape[0] - 1)) / d, lo + 1


def _xv_dd_f2c(p, d):  # out[i] = (q[i+1] - q[i]) / d
    a, lo = p
    return (_slice(a, _AX, 1, a.shape[0]) - _slice(a, _AX, 0, a.shape[0] - 1)) / d, lo


def _xv_interp_f2c(p):  # out[i] = (q[i] + q[i+1]) / 2
    a, lo = p
    return 0.5 * (_slice(a, _AX, 0, a.shape[0] - 1) + _slice(a, _AX, 1, a.shape[0])), lo


def _xv_interp_c2f(p):  # out[i] = (q[i-1] + q[i]) / 2
    a, lo = p
    return 0.5 * (_slice(a, _AX, 0, a.shape[0] - 1) + _slice(a, _AX, 1, a.shape[0])), lo + 1


def _xv_d2(p, d):
    a, lo = p
    n = a.shape[0]
    return (
        (_slice(a, _AX, 2, n) - 2.0 * _slice(a, _AX, 1, n - 1) + _slice(a, _AX, 0, n - 2))
        / (d * d),
        lo + 1,
    )



def _xv_uw_flux(p, vel, m):
    """vel * UB5 x reconstruction in valid mode, flux form (see
    _c6_d5_flux)."""
    a, lo = p
    n_out = a.shape[0] - 5
    out_lo = lo + 3 - m

    def tap(off):
        s = 3 + off
        return _slice(a, _AX, s, s + n_out)

    va, lv = vel
    v = _slice(va, _AX, out_lo - lv, out_lo - lv + n_out)
    return _c6_d5_flux(tap, v), out_lo


_HALO = 4  # x width of the prev/next halo view blocks (UB5 needs 3 columns)


def _stage_rk_kernel(
    refs,
    *,
    x_blk: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    gamma: float,
    zeta: float,
    emit_g: bool,
    emit_rhat: bool = False,
    nxb: int = 0,
    element_windows: bool = False,
):
    """One full RK3 stage for one (env-slab, x-block) grid step: in-kernel
    pressure correction of the previous stage's fields (lazy projection),
    hydrostatic pressure from b, all four UB5 tendencies, the RK field
    update f* = f + dt (gamma g + zeta g_prev), and the divergence of the
    updated fields for the next Poisson solve.

    refs: dt (SMEM), u_h,u_c,u_H, v_h,v_c,v_H, w_h,w_c,w_H, b_h,b_c,b_H,
          q_h,q_c,q_H, bot_c, [gp_u,gp_v,gp_w,gp_b,gp_u_edge when
          zeta != 0], then outputs [gu,gv,gw,gb when emit_g] +
          u*,v*,w*,b' + div, then the gu scratch.  The _h/_H views are
    narrow (_HALO-wide) blocks adjacent to the center block (periodic
    modulo in the index map), so each field is read ~2x per stage instead
    of the 3x that full-width prev/next views cost.

    Lazy-projection contract (replaces the div/correct glue kernels): the
    incoming u,v,w are the UNPROJECTED previous-stage fields and ``q`` is
    the Poisson solve of their divergence; the kernel applies
    u -= grad(q) on the extended slabs before the tendencies (exactly the
    correction the glue kernel applied, so values match bit-for-bit) and
    emits div(u*,v*,w*) so the caller only runs the MXU Poisson solve
    between stages. Because the u* divergence needs u* at the right block
    face, the u tendency is accumulated one column wider (x_blk+1) in a
    scratch ref; the g_prev value at that face comes from the 1-wide
    ``gp_u_edge`` view of the previous stage's gu output.

    When emit_g is False (the final stage: no later stage consumes g) the
    v/w/b tendencies accumulate directly into the field-output refs and
    are finished in place by the affine RK update. Every term still lands
    in a ref write (ordering barriers bound Mosaic register pressure, see
    _field_stage_kernel)."""
    o = _make_grid_ops(dx, dy, dz)
    refs = list(refs)
    dt_r = refs.pop(0)
    if element_windows:
        # one overlapping pl.Element window per field over XLA-x-padded
        # arrays (see make_stage_rk_3d(element_windows=True)); halos are
        # part of the window, so there is no in-VMEM concat copy.
        u_w, v_w, w_w, b_w, q_w, bot_c = refs[:6]
        rest = refs[6:]
    else:
        (u_h, u_c, u_H, v_h, v_c, v_H, w_h, w_c, w_H,
         b_h, b_c, b_H, q_h, q_c, q_H, bot_c) = refs[:16]
        rest = refs[16:]
    with_gprev = zeta != 0.0
    gp = {}
    if with_gprev:
        gp["u"], gp["v"], gp["w"], gp["b"], gp["u_edge"] = rest[:5]
        rest = rest[5:]
    ta_r = None
    if emit_rhat:
        # last input (after bot/g_prev): this x-block's column slab of the
        # Poisson analysis matrix T_A^T, (1, x_blk*nz, nx*nz)
        ta_r = rest[0]
        rest = rest[1:]
    g_out = {}
    if emit_g:
        g_out["u"], g_out["v"], g_out["w"], g_out["b"] = rest[:4]
        rest = rest[4:]
    f_out = dict(zip("uvwb", rest[:4]))
    if emit_rhat:
        # outputs replace div with rhat; scratches are [gu_scr, rhat_scr]
        rhat_out = rest[4]
        gu_scr = rest[5]
        rhat_scr = rest[6]
        div_r = None
    else:
        div_r = rest[4]
        gu_scr = rest[5]

    def ext(h_r, c_r, H_r, right=3):
        """(x_blk+3+right, nk, ny, E) extended slab; ext coord 0 = real -3.

        element_windows mode: h_r IS the whole (x_blk+2*_XH)-wide padded
        window (c_r/H_r unused) and ext coord 0 = real -_XH = -4, so
        lo = -1 in the valid-mode frame."""
        if element_windows:
            return h_r[...], -1
        return (
            jnp.concatenate(
                [
                    _slice(h_r[:], _AX, _HALO - 3, _HALO),
                    c_r[:],
                    _slice(H_r[:], _AX, 0, right),
                ],
                axis=_AX,
            ),
            0,
        )

    def centerN(p, n_out=x_blk):
        a, lo = p
        s = 3 - lo
        return _slice(a, _AX, s, s + n_out)

    center = centerN

    def lift(f):  # y/z op on an (array, lo) pair: x extent preserved
        return lambda p, *args: (f(p[0], *args), p[1])

    def make_emit(acc_r, width=x_blk):
        state = {"first": True}

        def emit(p, zero_walls=False):
            if zero_walls:
                acc_r[...] = o["zero_z_walls"](acc_r[...])
                return
            term = centerN(p, width) if isinstance(p, tuple) else p
            if state["first"]:
                acc_r[...] = term
                state["first"] = False
            else:
                acc_r[...] = acc_r[...] + term

        return emit

    dt = dt_r[0]

    def acc_for(name):
        if name == "u":
            return gu_scr
        return g_out[name] if emit_g else f_out[name]

    def rk_update(name, F):
        """f* = center(F) + dt (gamma g + zeta g_prev); g is read back from
        whichever ref the tendency accumulated into (matches the XLA RK
        expression bit-for-bit up to the shared f32 contraction order)."""
        upd = gamma * acc_for(name)[...]
        if with_gprev:
            upd = upd + zeta * gp[name][...]
        f_out[name][...] = center(F) + dt * upd

    # Pressure correction of the previous stage's unprojected fields:
    # u -= ddx(q), v -= ddy(q), w -= ddz_interior(q). q is the solve of the
    # UNSCALED divergence, so no dt factor appears (see make_projection_glue).
    if element_windows:
        Q = (q_w[...], -1)
        U = _xa_sub(ext(u_w, None, None), _xv_dd_c2f(Q, dx))
        V = _xa_sub(ext(v_w, None, None), lift(o["ddy_c2f"])(Q))
        W = _xa_sub(ext(w_w, None, None), lift(o["ddz_c2f_interior"])(Q))
        B = ext(b_w, None, None)
    else:
        Q = (jnp.concatenate([q_h[:], q_c[:], q_H[:]], axis=_AX), -1)
        U = _xa_sub(ext(u_h, u_c, u_H, right=4), _xv_dd_c2f(Q, dx))
        V = _xa_sub(ext(v_h, v_c, v_H), lift(o["ddy_c2f"])(Q))
        W = _xa_sub(ext(w_h, w_c, w_H), lift(o["ddz_c2f_interior"])(Q))
        B = ext(b_h, b_c, b_H)
    # Hydrostatic anomaly pressure on the extended slab, straight from b —
    # replaces the XLA _hydrostatic_pressure pass (same sum up to f32
    # association: suffix sum by doubling shifts). Inherits B's frame
    # offset (0 for halo views, -1 for element windows).
    PHY = (_hydro(B[0], nz, dz, min_b), B[1])

    def y_flux(q, vel, m):
        a, b_, lo = _xa_align(q, vel)
        return _uw_flux_periodic(a, b_, _AY, m), lo

    def z_flux(q, vel, n_dst, split):
        a, b_, lo = _xa_align(q, vel)
        return _z_uw_flux(a, b_, n_dst, split), lo

    # ---- u at (fx, cy, cz), one extra column for the div of u* -------------
    emit = make_emit(gu_scr, width=x_blk + 1)
    u_cx = _xv_interp_f2c(U)
    emit(_xv_dd_c2f(_xv_uw_flux(U, u_cx, m=1), dx))
    v_fxfy = _xv_interp_c2f(V)
    emit(lift(o["ddy_f2c"])(y_flux(U, v_fxfy, m=0)))
    w_fx = _xv_interp_c2f(W)
    emit(lift(o["ddz_f2c"])(z_flux(U, w_fx, n_dst=nz + 1, split=0)))
    gu_scr[...] = -gu_scr[...]
    emit(-centerN(_xv_dd_c2f(PHY, dx), x_blk + 1))
    Ucp = centerN(U, x_blk + 1)  # x-cropped view for pure y/z terms
    emit(nu * centerN(_xv_d2(U, dx), x_blk + 1))
    emit(nu * o["d2y"](Ucp))
    emit(nu * o["d2z_value_bc"](Ucp, 0.0, 0.0))
    upd = gamma * gu_scr[...]
    if with_gprev:
        upd = upd + zeta * jnp.concatenate(
            [gp["u"][...], gp["u_edge"][...]], axis=_AX
        )
    u_new = Ucp + dt * upd  # (x_blk+1)-wide updated u*
    f_out["u"][...] = _slice(u_new, _AX, 0, x_blk)
    if emit_g:
        g_out["u"][...] = _slice(gu_scr[...], _AX, 0, x_blk)

    # ---- v at (cx, fy, cz) -------------------------------------------------
    emit = make_emit(acc_for("v"))
    u_fxfy = lift(o["interp_c2f_y"])(U)
    emit(_xv_dd_f2c(_xv_uw_flux(V, u_fxfy, m=0), dx))
    v_cy = lift(o["interp_f2c_y"])(V)
    emit(lift(o["ddy_c2f"])(y_flux(V, v_cy, m=1)))
    w_fy = lift(o["interp_c2f_y"])(W)
    emit(lift(o["ddz_f2c"])(z_flux(V, w_fy, n_dst=nz + 1, split=0)))
    acc_for("v")[...] = -acc_for("v")[...]
    emit(-o["ddy_c2f"](center(PHY)))
    Vc = center(V)
    emit(nu * center(_xv_d2(V, dx)))
    emit(nu * o["d2y"](Vc))
    emit(nu * o["d2z_value_bc"](Vc, 0.0, 0.0))
    rk_update("v", V)

    # ---- w at (cx, cy, fz) -------------------------------------------------
    emit = make_emit(acc_for("w"))
    u_fz = lift(o["interp_c2f_z_interior"])(U)
    emit(_xv_dd_f2c(_xv_uw_flux(W, u_fz, m=0), dx))
    v_fz = lift(o["interp_c2f_z_interior"])(V)
    emit(lift(o["ddy_f2c"])(y_flux(W, v_fz, m=0)))
    w_cz = lift(o["interp_f2c_z"])(W)
    emit(lift(o["ddz_c2f_interior"])(
        z_flux(W, w_cz, n_dst=nz, split=1)
    ))
    acc_for("w")[...] = -acc_for("w")[...]
    Wc = center(W)
    emit(nu * center(_xv_d2(W, dx)))
    emit(nu * o["d2y"](Wc))
    emit(nu * o["d2z_face_interior"](Wc))
    emit(None, zero_walls=True)
    rk_update("w", W)  # wall rows stay exactly 0: center(W), g, g_prev all 0

    # ---- buoyancy tracer ---------------------------------------------------
    emit = make_emit(acc_for("b"))
    emit(_xv_dd_f2c(_xv_uw_flux(B, U, m=0), dx))
    emit(lift(o["ddy_f2c"])(y_flux(B, V, m=0)))
    emit(lift(o["ddz_f2c"])(z_flux(B, W, n_dst=nz + 1, split=0)))
    acc_for("b")[...] = -acc_for("b")[...]
    Bc = center(B)
    emit(kappa * center(_xv_d2(B, dx)))
    emit(kappa * o["d2y"](Bc))
    emit(kappa * o["d2z_value_bc"](Bc, bot_c[:], min_b))
    rk_update("b", B)

    # ---- divergence of the updated (unprojected) fields for the next
    # Poisson solve: ddx needs u* at the right block face, which is the
    # extra column carried in u_new; v*/w* wrap in-sublane (full ny/nz).
    div = (
        centerN(_xv_dd_f2c((u_new, 3), dx), x_blk)
        + o["ddy_f2c"](f_out["v"][...])
        + o["ddz_f2c"](f_out["w"][...])
    )
    if not emit_rhat:
        div_r[...] = div
        return

    # ---- in-kernel Poisson analysis: accumulate rhat += T_A[:, blk] @ div
    # over the x-block grid steps (MXU work interleaved with the VPU
    # tendency work above), emitting the (x,z)-modal RHS directly — the
    # div never round-trips HBM and the analysis matmul rides under the
    # stage's VPU shadow. The XLA side finishes with
    # ops/poisson.make_poisson_tail_3d_bm (docs/PERF_NOTES_3D.md round-4).
    xb, zb, yb, eb = div.shape
    part = jax.lax.dot_general(
        ta_r[0],  # (x_blk*nz, nx*nz): rows = this block's merged (x,z)
        div.reshape(xb * zb, yb, eb),
        ((( 0,), (0,)), ((), ())),
        preferred_element_type=div.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (nx*nz, ny, e_blk)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        rhat_scr[...] = part

    @pl.when(i != 0)
    def _acc():
        rhat_scr[...] = rhat_scr[...] + part

    @pl.when(i == nxb - 1)
    def _flush():
        rhat_out[...] = rhat_scr[...]


def _div_kernel(refs, *, dx, dy, dz):
    """Staggered divergence of (u, v, w) in one VMEM pass (the XLA version
    materializes each derivative: ~4x the HBM traffic)."""
    u_r, v_r, w_r, d_r = refs
    o = _make_grid_ops(dx, dy, dz)
    d_r[:] = o["ddx_f2c"](u_r[:]) + o["ddy_f2c"](v_r[:]) + o["ddz_f2c"](w_r[:])


def _correct_kernel(refs, *, dx, dy, dz):
    """Velocity correction u -= grad(q) in one VMEM pass. ``q`` is the
    Poisson solve of the UNSCALED divergence: because the solve is linear,
    dt_stage cancels out of the correction (p = q / dt_stage is recovered
    outside only where the pressure itself is stored)."""
    u_r, v_r, w_r, q_r, uo_r, vo_r, wo_r = refs
    o = _make_grid_ops(dx, dy, dz)
    q = q_r[:]
    uo_r[:] = u_r[:] - o["ddx_c2f"](q)
    vo_r[:] = v_r[:] - o["ddy_c2f"](q)
    wo_r[:] = w_r[:] - o["ddz_c2f_interior"](q)


@functools.lru_cache(maxsize=None)
def make_projection_glue_3d(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    e_blk: int = DEFAULT_E_BLK_3D,
    interpret: bool = False,
    vmem_limit_mb: int = 127,
):
    """Build the fused projection glue: ``div(u, v, w) -> div`` and
    ``correct(u, v, w, q) -> (u', v', w')`` kernels around the (XLA/MXU)
    Poisson solve. Both run full-x at full lanes with single-buffered
    windows; together they replace ~3.7 ms/stage-unit of unfused XLA
    stencils with ~0.9 ms of HBM-roofline passes (see
    docs/PERF_NOTES_3D.md round-2 ablation)."""
    single = pl.Buffered(buffer_count=1)

    def spec(n):
        return pl.BlockSpec(
            (nx, n, ny, e_blk), lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM, pipeline_mode=single,
        )

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
    )

    div_kernel = functools.partial(
        lambda *refs, **kw: _div_kernel(refs, **kw), dx=dx, dy=dy, dz=dz
    )
    corr_kernel = functools.partial(
        lambda *refs, **kw: _correct_kernel(refs, **kw), dx=dx, dy=dy, dz=dz
    )

    def div(u, v, w):
        e = u.shape[-1]
        return pl.pallas_call(
            div_kernel,
            grid=(e // e_blk,),
            in_specs=[spec(nz), spec(nz), spec(nz + 1)],
            out_specs=spec(nz),
            out_shape=jax.ShapeDtypeStruct((nx, nz, ny, e), u.dtype),
            compiler_params=compiler_params,
            interpret=interpret,
        )(u, v, w)

    def correct(u, v, w, q):
        e = u.shape[-1]
        return pl.pallas_call(
            corr_kernel,
            grid=(e // e_blk,),
            in_specs=[spec(nz), spec(nz), spec(nz + 1), spec(nz)],
            out_specs=(spec(nz), spec(nz), spec(nz + 1)),
            out_shape=(
                jax.ShapeDtypeStruct((nx, nz, ny, e), u.dtype),
                jax.ShapeDtypeStruct((nx, nz, ny, e), u.dtype),
                jax.ShapeDtypeStruct((nx, nz + 1, ny, e), u.dtype),
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(u, v, w, q)

    return div, correct


@functools.lru_cache(maxsize=None)
def make_stage_rk_3d(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    x_blk: int = 8,
    e_blk: int = DEFAULT_E_BLK_3D,
    interpret: bool = False,
    vmem_limit_mb: int = 127,
    single_buffer: bool = True,
    emit_rhat: bool = False,
    element_windows: bool = False,
):
    """Build the three x-blocked fused lazy-projection RK3-stage kernels
    (in-kernel pressure correction, hydrostatic pressure, all four UB5
    tendencies, the RK field update, and the updated-field divergence in
    one kernel per stage).

    Returns ``(stage0, stage1, stage2)`` over batch-minor (nx, nz[+1], ny,
    E) arrays (bottom is (nx, ny, E)); E must divide by ``e_blk`` and nx by
    ``x_blk`` (and by ``_HALO``). ``q`` is the Poisson solve of the
    previous stage's emitted div (zeros at the first stage of an env step):

      stage0(u*, v*, w*, b, q, bottom, dt)         -> (u*, v*, w*, b', div, gu, gv, gw, gb)
      stage1(u*, v*, w*, b, q, bottom, dt, g_prev) -> (u*, v*, w*, b', div, gu, gv, gw, gb)
      stage2(u*, v*, w*, b, q, bottom, dt, g_prev) -> (u*, v*, w*, b', div)

    The returned velocities are UNPROJECTED (u* = u + dt(...)); the next
    stage applies the correction in-kernel, and the caller materializes
    the final correction once per env step (see solver3d).

    The env lanes are blocked directly via the index map (no slab-stacking
    relayout at the call boundary — lane blocks of 128 lower fine, see the
    projection-glue kernels), the x halo comes from narrow ``_HALO``-wide
    neighbor views, stage 0 takes no g_prev (zeta = 0) and stage 2 emits no
    g (nothing consumes it: the next substep's stage 0 has zeta = 0)."""
    assert nx % x_blk == 0 and x_blk % _HALO == 0, (nx, x_blk)
    assert not (element_windows and emit_rhat), (
        "in-kernel Poisson analysis is not supported with element windows"
    )
    nxb = nx // x_blk
    nxh = nx // _HALO
    r = x_blk // _HALO

    # buffer_count=1 halves the pipeline VMEM (no DMA/compute overlap);
    # None restores Mosaic's default double buffering — sweepable via
    # scripts/sweep3d.py. single_buffer may be True (all single), False
    # (all double) or "mixed" (narrow halo/edge views single, center
    # blocks double: most of the overlap win at ~60% of the VMEM cost).
    if isinstance(single_buffer, str) and single_buffer not in (
        "mixed", "halo_double"
    ):
        # a typo like "double" would otherwise be truthy and silently
        # select all-single buffering (round-3 advice)
        raise ValueError(
            f"single_buffer={single_buffer!r}: expected bool, 'mixed', "
            "or 'halo_double'"
        )
    if single_buffer == "mixed":
        single = pl.Buffered(buffer_count=1)
        center_buf = None
    elif single_buffer == "halo_double":
        single = None
        center_buf = pl.Buffered(buffer_count=1)
    else:
        single = pl.Buffered(buffer_count=1) if single_buffer else None
        center_buf = single
    NKS = (nz, nz, nz + 1, nz)

    def views(n):
        """halo-prev/center/halo-next BlockSpecs for one (nx, n, ny, E) field."""
        def halo(shift):
            def index_map(s, i):
                # np.int32 keeps the rem int32 under jax_enable_x64
                return (
                    jax.lax.rem(i * np.int32(r) + np.int32(shift + nxh), np.int32(nxh)),
                    0, 0, s,
                )
            return pl.BlockSpec(
                (_HALO, n, ny, e_blk), index_map,
                memory_space=pltpu.VMEM, pipeline_mode=single,
            )
        return [halo(-1), center_spec(n), halo(r)]

    def center_spec(n):
        return pl.BlockSpec(
            (x_blk, n, ny, e_blk), lambda s, i: (i, 0, 0, s),
            memory_space=pltpu.VMEM, pipeline_mode=center_buf,
        )

    bot_spec = pl.BlockSpec(
        (x_blk, ny, e_blk), lambda s, i: (i, 0, s),
        memory_space=pltpu.VMEM, pipeline_mode=single,
    )
    # 1-wide view of the previous stage's gu at this block's right face
    # (element column ((i+1)*x_blk) % nx), feeding the div's u* edge.
    gu_edge_spec = pl.BlockSpec(
        (1, nz, ny, e_blk),
        lambda s, i: (
            jax.lax.rem((i + np.int32(1)) * np.int32(x_blk), np.int32(nx)),
            0, 0, s,
        ),
        memory_space=pltpu.VMEM, pipeline_mode=single,
    )
    dt_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
    )

    K = nx * nz
    ta_blocks = None
    if emit_rhat:
        from rbc_gym_tpu.ops.poisson import poisson_analysis_matrix_3d

        # T_A^T chunked by x-block: block i holds the (x_blk*nz, K) rows
        # pairing with divergence x-block i (x-major (x,z) merge).
        ta_blocks = jnp.asarray(
            poisson_analysis_matrix_3d(nx, nz).T.reshape(nxb, x_blk * nz, K),
            jnp.float32,
        )
        ta_spec = pl.BlockSpec(
            (1, x_blk * nz, K), lambda s, i: (i, 0, 0),
            memory_space=pltpu.VMEM, pipeline_mode=single,
        )
        rhat_spec = pl.BlockSpec(
            (K, ny, e_blk), lambda s, i: (0, 0, s),
            memory_space=pltpu.VMEM, pipeline_mode=center_buf,
        )

    def build(m):
        gamma, zeta = _RK3_GAMMA[m], _RK3_ZETA[m]
        emit_g = m < 2
        with_gprev = zeta != 0.0
        kernel = functools.partial(
            lambda *refs, **kw: _stage_rk_kernel(refs, **kw),
            x_blk=x_blk, nz=nz, dx=dx, dy=dy, dz=dz,
            nu=nu, kappa=kappa, min_b=min_b,
            gamma=gamma, zeta=zeta, emit_g=emit_g,
            emit_rhat=emit_rhat, nxb=nxb,
            element_windows=element_windows,
        )

        def window_spec(n):
            # one overlapping pl.Element window per field over the
            # x-padded array: ext coord 0 = real -_XH, no concat copy
            return pl.BlockSpec(
                (pl.Element(x_blk + 2 * _XH), pl.Element(n),
                 pl.Element(ny), pl.Element(e_blk)),
                lambda s, i: (i * x_blk, 0, 0, s * e_blk),
                memory_space=pltpu.VMEM, pipeline_mode=single,
            )

        if element_windows:
            field_in = [window_spec(n) for n in (nz, nz, nz + 1, nz, nz)]
        else:
            field_in = (
                views(nz) + views(nz) + views(nz + 1) + views(nz)
                + views(nz)  # q
            )
        in_specs = (
            [dt_spec]
            + field_in
            + [bot_spec]
            + (
                [center_spec(n) for n in NKS] + [gu_edge_spec]
                if with_gprev
                else []
            )
            + ([ta_spec] if emit_rhat else [])
        )
        out_specs = (
            [center_spec(n) for n in NKS] if emit_g else []
        ) + [center_spec(n) for n in NKS] + [
            rhat_spec if emit_rhat else center_spec(nz)
        ]

        def stage(u, v, w, b, q, bottom, dt, g_prev=None):
            e = u.shape[-1]
            if e % e_blk:
                raise ValueError(f"env axis {e} not a multiple of e_blk {e_blk}")
            dtype = u.dtype
            field_shapes = [
                jax.ShapeDtypeStruct((nx, n, ny, e), dtype) for n in NKS
            ]
            div_shape = jax.ShapeDtypeStruct(
                (K, ny, e) if emit_rhat else (nx, nz, ny, e), dtype
            )
            out_shape = (
                (field_shapes if emit_g else []) + field_shapes + [div_shape]
            )
            dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
            if element_windows:
                def _pad_x(f):
                    return jnp.concatenate([f[-_XH:], f, f[:_XH]], axis=0)

                args = [dt_arr] + [_pad_x(f) for f in (u, v, w, b, q)]
                args.append(bottom)
            else:
                args = [dt_arr, u, u, u, v, v, v, w, w, w, b, b, b,
                        q, q, q, bottom]
            if with_gprev:
                args += list(g_prev) + [g_prev[0]]
            if emit_rhat:
                args.append(ta_blocks.astype(dtype))
            scratch_shapes = [pltpu.VMEM((x_blk + 1, nz, ny, e_blk), dtype)]
            if emit_rhat:
                scratch_shapes.append(pltpu.VMEM((K, ny, e_blk), dtype))
            outs = pl.pallas_call(
                kernel,
                grid=(e // e_blk, nxb),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=compiler_params,
                interpret=interpret,
                scratch_shapes=scratch_shapes,
            )(*args)
            if emit_g:
                return tuple(outs[4:]) + tuple(outs[:4])
            return tuple(outs)

        return stage

    return build(0), build(1), build(2)


# ---------------------------------------------------------------------------
# (x, y)-blocked whole-stage kernel — the big-grid path.
#
# The x-only stage kernel holds full (nz+1, ny) columns per x-window; above
# (nz+1)*ny ~ 1088 (e.g. the reference's 32x64x64 flowstats grid at 2112,
# /root/reference/experiments/flowstats/flowstats_ra.py:27-36) every block
# geometry OOMs Mosaic's VMEM (round-4 sweep). This variant blocks BOTH
# horizontal axes. Each field reaches the kernel as ONE overlapping
# all-``pl.Element`` window of an XLA-pre-padded array (periodic halos
# attached outside the kernel, so windows start at element (i*x_blk,
# j*y_blk) of the padded frame and never wrap) — no in-VMEM halo concat
# copy, which is what made a 9-shifted-view variant of this design OOM.
# x keeps the valid-mode (array, lo) machinery; y uses the simpler
# GARBAGE-HALO scheme: ALL y-direction ops run unchanged (periodic pads)
# on the y-extended slab — the periodic wrap at
# the slab's y edges is wrong there, but the contamination advances at most
# one op radius per op and the deepest composed y chain (UB5 recon + flux
# divergence + the q-correction's one-column loss) reaches at most 5
# columns in, so with _YH = 8 the [_YH, _YH + y_blk) center crop is exact.
# y-length is invariant under every y op, so no y alignment bookkeeping is
# needed anywhere.
#
# The divergence edge problem is symmetric in x and y: div(u*,v*,w*) needs
# u* one column past the block in x (handled as in the x-only kernel via
# the gu scratch + gp_u_edge view) and now v* one column past in y —
# handled identically with a (y_blk+1)-wide gv scratch + a _YH-wide
# gp_v_edge view (column 0 used) of the previous stage's gv output.
# ---------------------------------------------------------------------------

_XH = 4  # x halo width of the extended windows (UB5 radius 3 + div edge 1)
_YH = 8  # y halo width (deepest composed y radius is 5; sublanes need 8)


def _stage_rk_kernel_xy(
    refs,
    *,
    x_blk: int,
    y_blk: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    gamma: float,
    zeta: float,
    emit_g: bool,
):
    """One full RK3 stage for one (env-slab, x-block, y-block) grid step;
    the (x,y)-blocked analogue of ``_stage_rk_kernel`` (same lazy-projection
    contract, same term order, so values match the XLA path to f32
    summation order).

    refs: dt (SMEM), then per field in u,v,w,b,q: 9 views (x-prev/center/
    next) x (y-prev/center/next), then bottom x3 (y views), then
    [gp_u, gp_v, gp_w, gp_b, gp_u_edge, gp_v_edge when zeta != 0], then
    outputs [gu,gv,gw,gb when emit_g] + u*,v*,w*,b' + div, then scratches
    [gu_scr (x_blk+1 wide), gv_scr (y_blk+1 wide in y)].
    """
    o = _make_grid_ops(dx, dy, dz)
    refs = list(refs)
    dt_r = refs.pop(0)
    field_refs = dict(zip(("u", "v", "w", "b", "q"), refs[:5]))
    bot_ref = refs[5]
    rest = refs[6:]
    with_gprev = zeta != 0.0
    gp = {}
    if with_gprev:
        (gp["u"], gp["v"], gp["w"], gp["b"],
         gp["u_edge"], gp["v_edge"]) = rest[:6]
        rest = rest[6:]
    g_out = {}
    if emit_g:
        g_out["u"], g_out["v"], g_out["w"], g_out["b"] = rest[:4]
        rest = rest[4:]
    f_out = dict(zip("uvwb", rest[:4]))
    div_r = rest[4]
    gu_scr = rest[5]
    gv_scr = rest[6]

    def ext(name):
        """((x_blk+2*_XH, nk, y_blk+2*_YH, E), lo=-1) extended slab view of
        the XLA-pre-padded field (periodic halos attached outside, so no
        in-kernel concat copy): ext x coord 0 = real -_XH = -4; y coord 0 =
        real y_start - _YH."""
        return field_refs[name][...], -1

    def ycrop(a, width=y_blk):
        return _slice(a, _AY, _YH, _YH + width)

    def centerN(p, n_out=x_blk):
        a, lo = p
        s = 3 - lo
        return _slice(a, _AX, s, s + n_out)

    center = centerN

    def lift(f):  # y/z op on an (array, lo) pair: x extent preserved
        return lambda p, *args: (f(p[0], *args), p[1])

    def make_emit(acc_r, width=x_blk, y_width=y_blk):
        state = {"first": True}

        def emit(p, zero_walls=False):
            if zero_walls:
                acc_r[...] = o["zero_z_walls"](acc_r[...])
                return
            term = centerN(p, width) if isinstance(p, tuple) else p
            term = ycrop(term, y_width)
            if state["first"]:
                acc_r[...] = term
                state["first"] = False
            else:
                acc_r[...] = acc_r[...] + term

        return emit

    dt = dt_r[0]

    def acc_for(name):
        if name == "u":
            return gu_scr
        if name == "v":
            return gv_scr
        return g_out[name] if emit_g else f_out[name]

    def rk_update(name, F):
        upd = gamma * acc_for(name)[...]
        if with_gprev:
            upd = upd + zeta * gp[name][...]
        f_out[name][...] = ycrop(center(F)) + dt * upd

    # Pressure correction of the previous stage's unprojected fields. All
    # extended slabs share the same frame: lo = -1 (ext x coord 0 = real
    # -4), y coord 0 = real y_start - _YH.
    Q = ext("q")
    U = _xa_sub(ext("u"), _xv_dd_c2f(Q, dx))
    V = _xa_sub(ext("v"), lift(o["ddy_c2f"])(Q))
    W = _xa_sub(ext("w"), lift(o["ddz_c2f_interior"])(Q))
    B = ext("b")
    PHY = (_hydro(B[0], nz, dz, min_b), B[1])
    BOT = bot_ref[...]  # (x_blk, y_blk+2*_YH, E): y-padded outside

    def y_flux(q, vel, m):
        a, b_, lo = _xa_align(q, vel)
        return _uw_flux_periodic(a, b_, _AY, m), lo

    def z_flux(q, vel, n_dst, split):
        a, b_, lo = _xa_align(q, vel)
        return _z_uw_flux(a, b_, n_dst, split), lo

    # ---- u at (fx, cy, cz), one extra x column for the div of u* ----------
    emit = make_emit(gu_scr, width=x_blk + 1)
    u_cx = _xv_interp_f2c(U)
    emit(_xv_dd_c2f(_xv_uw_flux(U, u_cx, m=1), dx))
    v_fxfy = _xv_interp_c2f(V)
    emit(lift(o["ddy_f2c"])(y_flux(U, v_fxfy, m=0)))
    w_fx = _xv_interp_c2f(W)
    emit(lift(o["ddz_f2c"])(z_flux(U, w_fx, n_dst=nz + 1, split=0)))
    gu_scr[...] = -gu_scr[...]
    # plain (non-tuple) terms below are x-cropped but still y-EXTENDED;
    # emit applies the final y crop exactly once.
    emit(-centerN(_xv_dd_c2f(PHY, dx), x_blk + 1))
    Ucp = centerN(U, x_blk + 1)  # x-cropped, y-extended view for y/z terms
    emit(nu * centerN(_xv_d2(U, dx), x_blk + 1))
    emit(nu * o["d2y"](Ucp))
    emit(nu * o["d2z_value_bc"](Ucp, 0.0, 0.0))
    upd = gamma * gu_scr[...]
    if with_gprev:
        upd = upd + zeta * jnp.concatenate(
            [gp["u"][...], gp["u_edge"][...]], axis=_AX
        )
    u_new = ycrop(Ucp) + dt * upd  # (x_blk+1, nz, y_blk, E) updated u*
    f_out["u"][...] = _slice(u_new, _AX, 0, x_blk)
    if emit_g:
        g_out["u"][...] = _slice(gu_scr[...], _AX, 0, x_blk)

    # ---- v at (cx, fy, cz), one extra y column for the div of v* ----------
    emit = make_emit(gv_scr, y_width=y_blk + 1)
    u_fxfy = lift(o["interp_c2f_y"])(U)
    emit(_xv_dd_f2c(_xv_uw_flux(V, u_fxfy, m=0), dx))
    v_cy = lift(o["interp_f2c_y"])(V)
    emit(lift(o["ddy_c2f"])(y_flux(V, v_cy, m=1)))
    w_fy = lift(o["interp_c2f_y"])(W)
    emit(lift(o["ddz_f2c"])(z_flux(V, w_fy, n_dst=nz + 1, split=0)))
    gv_scr[...] = -gv_scr[...]
    emit(-o["ddy_c2f"](center(PHY)))
    Vc = center(V)  # (x_blk, nz, y-ext, E)
    emit(nu * center(_xv_d2(V, dx)))
    emit(nu * o["d2y"](Vc))
    emit(nu * o["d2z_value_bc"](Vc, 0.0, 0.0))
    upd = gamma * gv_scr[...]
    if with_gprev:
        upd = upd + zeta * jnp.concatenate(
            [gp["v"][...], _slice(gp["v_edge"][...], _AY, 0, 1)], axis=_AY
        )
    v_new = ycrop(Vc, y_blk + 1) + dt * upd  # (x_blk, nz, y_blk+1, E)
    f_out["v"][...] = _slice(v_new, _AY, 0, y_blk)
    if emit_g:
        g_out["v"][...] = _slice(gv_scr[...], _AY, 0, y_blk)

    # ---- w at (cx, cy, fz) -------------------------------------------------
    emit = make_emit(acc_for("w"))
    u_fz = lift(o["interp_c2f_z_interior"])(U)
    emit(_xv_dd_f2c(_xv_uw_flux(W, u_fz, m=0), dx))
    v_fz = lift(o["interp_c2f_z_interior"])(V)
    emit(lift(o["ddy_f2c"])(y_flux(W, v_fz, m=0)))
    w_cz = lift(o["interp_f2c_z"])(W)
    emit(lift(o["ddz_c2f_interior"])(
        z_flux(W, w_cz, n_dst=nz, split=1)
    ))
    acc_for("w")[...] = -acc_for("w")[...]
    Wc = center(W)
    emit(nu * center(_xv_d2(W, dx)))
    emit(nu * o["d2y"](Wc))
    emit(nu * o["d2z_face_interior"](Wc))
    emit(None, zero_walls=True)
    rk_update("w", W)

    # ---- buoyancy tracer ---------------------------------------------------
    emit = make_emit(acc_for("b"))
    emit(_xv_dd_f2c(_xv_uw_flux(B, U, m=0), dx))
    emit(lift(o["ddy_f2c"])(y_flux(B, V, m=0)))
    emit(lift(o["ddz_f2c"])(z_flux(B, W, n_dst=nz + 1, split=0)))
    acc_for("b")[...] = -acc_for("b")[...]
    Bc = center(B)
    emit(kappa * center(_xv_d2(B, dx)))
    emit(kappa * o["d2y"](Bc))
    emit(kappa * o["d2z_value_bc"](Bc, BOT, min_b))
    rk_update("b", B)

    # ---- divergence of the updated (unprojected) fields: u* at the right
    # x face from u_new's extra column, v* at the far y face from v_new's
    # extra column, w* wraps in z (full nz+1 rows in the block).
    div_r[...] = (
        (_slice(u_new, _AX, 1, x_blk + 1) - _slice(u_new, _AX, 0, x_blk)) / dx
        + (_slice(v_new, _AY, 1, y_blk + 1) - _slice(v_new, _AY, 0, y_blk)) / dy
        + o["ddz_f2c"](f_out["w"][...])
    )


@functools.lru_cache(maxsize=None)
def make_stage_rk_3d_xy(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    x_blk: int = 8,
    y_blk: int = 8,
    e_blk: int = DEFAULT_E_BLK_3D,
    interpret: bool = False,
    vmem_limit_mb: int = 127,
    single_buffer: bool = True,
):
    """Build the three (x,y)-blocked fused lazy-projection RK3-stage
    kernels for grids whose (nz+1)*ny column footprint exceeds the x-only
    kernel's VMEM ceiling (see the block comment above). Same stage
    signatures and return convention as ``make_stage_rk_3d``; the final
    per-env-step correction must be materialized by the caller (solver3d
    uses the XLA correction there — the full-slab glue kernels do not fit
    VMEM at these grids)."""
    assert nx % x_blk == 0 and x_blk % _HALO == 0, (nx, x_blk)
    assert ny % y_blk == 0 and y_blk % _YH == 0 and ny % _YH == 0, (ny, y_blk)
    nxb = nx // x_blk
    nyb = ny // y_blk

    single = pl.Buffered(buffer_count=1) if single_buffer else None
    NKS = (nz, nz, nz + 1, nz)
    XW = x_blk + 2 * _XH  # extended window widths
    YW = y_blk + 2 * _YH

    def field_spec(n):
        """One OVERLAPPING all-Element window per field over the XLA-padded
        (nx + 2*_XH, n, ny + 2*_YH, E) array: window (i, j) starts at
        element (i*x_blk, 0, j*y_blk, s*e_blk) — periodic halos were
        attached outside, so windows never wrap and the kernel gets its
        extended slab with no in-VMEM concat copy."""
        return pl.BlockSpec(
            (pl.Element(XW), pl.Element(n), pl.Element(YW),
             pl.Element(e_blk)),
            lambda s, i, j: (i * x_blk, 0, j * y_blk, s * e_blk),
            memory_space=pltpu.VMEM, pipeline_mode=single,
        )

    def center_spec(n):
        return pl.BlockSpec(
            (x_blk, n, y_blk, e_blk), lambda s, i, j: (i, 0, j, s),
            memory_space=pltpu.VMEM, pipeline_mode=single,
        )

    bot_spec = pl.BlockSpec(
        (pl.Element(x_blk), pl.Element(YW), pl.Element(e_blk)),
        lambda s, i, j: (i * x_blk, j * y_blk, s * e_blk),
        memory_space=pltpu.VMEM, pipeline_mode=single,
    )

    gu_edge_spec = pl.BlockSpec(
        (1, nz, y_blk, e_blk),
        lambda s, i, j: (
            jax.lax.rem((i + np.int32(1)) * np.int32(x_blk), np.int32(nx)),
            0, j, s,
        ),
        memory_space=pltpu.VMEM, pipeline_mode=single,
    )
# y is the sublane dim: blocks there must be multiples of 8, so the v-edge
    # view is _YH wide (its column 0 is the needed face column; the kernel
    # slices it out).
    gv_edge_spec = pl.BlockSpec(
        (x_blk, nz, _YH, e_blk),
        lambda s, i, j: (
            i, 0,
            jax.lax.rem((j + np.int32(1)) * np.int32(y_blk // _YH),
                        np.int32(ny // _YH)),
            s,
        ),
        memory_space=pltpu.VMEM, pipeline_mode=single,
    )
    dt_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
    )

    def build(m):
        gamma, zeta = _RK3_GAMMA[m], _RK3_ZETA[m]
        emit_g = m < 2
        with_gprev = zeta != 0.0
        kernel = functools.partial(
            lambda *refs, **kw: _stage_rk_kernel_xy(refs, **kw),
            x_blk=x_blk, y_blk=y_blk, nz=nz, dx=dx, dy=dy, dz=dz,
            nu=nu, kappa=kappa, min_b=min_b,
            gamma=gamma, zeta=zeta, emit_g=emit_g,
        )
        in_specs = (
            [dt_spec]
            + [field_spec(n) for n in (nz, nz, nz + 1, nz, nz)]  # u,v,w,b,q
            + [bot_spec]
            + (
                [center_spec(n) for n in NKS] + [gu_edge_spec, gv_edge_spec]
                if with_gprev
                else []
            )
        )
        out_specs = (
            [center_spec(n) for n in NKS] if emit_g else []
        ) + [center_spec(n) for n in NKS] + [center_spec(nz)]

        def _pad_xy(f):
            """Attach periodic x/y halos: (nx, nk, ny, E) ->
            (nx + 2*_XH, nk, ny + 2*_YH, E)."""
            f = jnp.concatenate(
                [f[-_XH:], f, f[:_XH]], axis=0
            )
            return jnp.concatenate(
                [f[:, :, -_YH:], f, f[:, :, :_YH]], axis=2
            )

        def stage(u, v, w, b, q, bottom, dt, g_prev=None):
            e = u.shape[-1]
            if e % e_blk:
                raise ValueError(f"env axis {e} not a multiple of e_blk {e_blk}")
            dtype = u.dtype
            field_shapes = [
                jax.ShapeDtypeStruct((nx, n, ny, e), dtype) for n in NKS
            ]
            out_shape = (
                (field_shapes if emit_g else []) + field_shapes
                + [jax.ShapeDtypeStruct((nx, nz, ny, e), dtype)]
            )
            dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
            bot_pad = jnp.concatenate(
                [bottom[:, -_YH:], bottom, bottom[:, :_YH]], axis=1
            )
            args = [dt_arr] + [_pad_xy(f) for f in (u, v, w, b, q)]
            args.append(bot_pad)
            if with_gprev:
                args += list(g_prev) + [g_prev[0], g_prev[1]]
            outs = pl.pallas_call(
                kernel,
                grid=(e // e_blk, nxb, nyb),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=compiler_params,
                interpret=interpret,
                scratch_shapes=[
                    pltpu.VMEM((x_blk + 1, nz, y_blk, e_blk), dtype),
                    pltpu.VMEM((x_blk, nz, y_blk + 1, e_blk), dtype),
                ],
            )(*args)
            if emit_g:
                return tuple(outs[4:]) + tuple(outs[:4])
            return tuple(outs)

        return stage

    return build(0), build(1), build(2)


@functools.lru_cache(maxsize=None)
def make_field_stage_3d(
    field: str,
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    nu: float,
    kappa: float,
    min_b: float,
    e_blk: int = DEFAULT_E_BLK_3D,
    interpret: bool = False,
    vmem_limit_mb: int = 127,
):
    """Build the fused tendency function for one prognostic field.

    Returns ``tend(fields...) -> g_f`` over batch-minor (nx, nz[+1], ny, E)
    arrays — signature per field:

      u, v: tend(u, v, w, p_hy)
      w:    tend(u, v, w)
      b:    tend(u, v, w, b, bottom)

    E must be a multiple of ``e_blk``; fields are passed slab-stacked as
    (n_slabs, nx, nk, ny, e_blk) so the block's lane dim equals the array's
    (Pallas requires lane blocks of 128 or whole-dim).
    """
    assert field in ("u", "v", "w", "b")
    nk = nz + 1 if field == "w" else nz

    kernel = functools.partial(
        lambda *refs, **kw: _field_stage_kernel(refs, **kw),
        field=field, nx=nx, ny=ny, nz=nz, dx=dx, dy=dy, dz=dz,
        nu=nu, kappa=kappa, min_b=min_b,
    )

    single = pl.Buffered(buffer_count=1)

    def field_spec(n):
        return pl.BlockSpec(
            (1, nx, n, ny, e_blk), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM, pipeline_mode=single,
        )

    uvw_specs = [field_spec(nz), field_spec(nz), field_spec(nz + 1)]
    if field in ("u", "v"):
        in_specs = uvw_specs + [field_spec(nz)]
    elif field == "w":
        in_specs = uvw_specs
    else:
        in_specs = uvw_specs + [
            field_spec(nz),
            pl.BlockSpec((1, nx, ny, e_blk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=single),
        ]
    out_specs = field_spec(nk)
    compiler_params = pltpu.CompilerParams(
        # 'arbitrary' stops Mosaic from software-pipelining across env
        # slabs, which would extend register live ranges (the body already
        # runs close to the spill-slot budget).
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
    )

    def _stack(q):
        parts = q.reshape(q.shape[:-1] + (-1, e_blk))
        return jnp.moveaxis(parts, -2, 0)

    def _unstack(q):
        return jnp.moveaxis(q, 0, -2).reshape(q.shape[1:-1] + (-1,))

    def tend(*arrays):
        e = arrays[0].shape[-1]
        if e % e_blk:
            raise ValueError(f"env axis {e} not a multiple of e_blk {e_blk}")
        n_slabs = e // e_blk
        dtype = arrays[0].dtype
        out_shape = jax.ShapeDtypeStruct((n_slabs, nx, nk, ny, e_blk), dtype)
        g = pl.pallas_call(
            kernel,
            grid=(n_slabs,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(*[_stack(q) for q in arrays])
        return _unstack(g)

    return tend
