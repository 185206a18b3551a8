"""Pressure-Poisson solver for the nonhydrostatic fractional step.

Replaces the Oceananigans FFT/eigenfunction pressure solver used by the
reference's ``NonhydrostaticModel`` (sim/rbc_sim2D.jl:149-160): each RK3
stage needs p solving

    laplace(p) = div(u*) / dt_stage

with periodic x (and y in 3D) and homogeneous Neumann z (walls).

TPU-first design: real FFT along the periodic axes diagonalizes the
horizontal part; the remaining per-mode 1D operators in z

    A_m = D2z_neumann + lambda_m I          (nz x nz tridiagonal)

are *pre-inverted at setup time* (float64 numpy) and applied as one batched
matmul over modes — the entire vertical solve is a single MXU einsum, with no
sequential Thomas recurrence and no data-dependent control flow. For the
grids this suite targets (nz <= 256) the stacked inverses are at most a few
MB — trivially resident in HBM and streamable through VMEM.

The mean (zero-wavenumber) mode is singular under Neumann BCs; its RHS has
zero vertical sum because the velocity field has zero net boundary flux
(w = 0 on both walls, periodic x). We use the Moore-Penrose pseudo-inverse
for that mode, which returns the zero-mean solution.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def _dft_eigenvalues(n: int, d: float) -> np.ndarray:
    """Eigenvalues of the periodic 1D second-difference for rfft modes."""
    m = np.arange(n // 2 + 1)
    return -(2.0 - 2.0 * np.cos(2.0 * np.pi * m / n)) / (d * d)


def _vertical_inverses(lams: np.ndarray, nz: int, dz: float) -> np.ndarray:
    """Stack of inverses of (D2z_neumann + lam I), shape (M, nz, nz)."""
    # Neumann ghost: p[-1] = p[0], p[nz] = p[nz-1] -> first/last diagonal -1.
    d2 = (
        np.diag(np.full(nz, -2.0))
        + np.diag(np.ones(nz - 1), 1)
        + np.diag(np.ones(nz - 1), -1)
    )
    d2[0, 0] = -1.0
    d2[-1, -1] = -1.0
    d2 /= dz * dz

    inv = np.empty((lams.size, nz, nz), dtype=np.float64)
    eye = np.eye(nz)
    for i, lam in enumerate(lams):
        a = d2 + lam * eye
        if abs(lam) < 1e-14:
            inv[i] = np.linalg.pinv(a)  # zero-mean solution for the mean mode
        else:
            inv[i] = np.linalg.inv(a)
    return inv


def _real_dft_matrices(n: int):
    """Real DFT analysis F (m_rows, n) and synthesis G (n, m_rows) with
    G @ F = I. Rows interleave cos/sin per wavenumber; mode 0 (and the
    Nyquist mode for even n) contribute a single cosine row."""
    i = np.arange(n)
    rows = []
    row_modes = []
    for m in range(n // 2 + 1):
        rows.append(np.cos(2.0 * np.pi * m * i / n))
        row_modes.append(m)
        if m != 0 and not (n % 2 == 0 and m == n // 2):
            rows.append(np.sin(2.0 * np.pi * m * i / n))
            row_modes.append(m)
    f = np.stack(rows)  # (n, n) — the real DFT is a square map
    modes = np.asarray(row_modes)
    # synthesis = scaled transpose: 1/n for the single (mode-0 / Nyquist)
    # rows, 2/n for paired cos/sin rows
    scale = np.full(f.shape[0], 2.0 / n)
    scale[modes == 0] = 1.0 / n
    if n % 2 == 0:
        scale[modes == n // 2] = 1.0 / n
    g = (f * scale[:, None]).T
    assert np.allclose(g @ f, np.eye(n), atol=1e-10)
    return f, g, modes


def make_poisson_solver_2d(
    nx: int, nz: int, dx: float, dz: float, dtype=jnp.float32
) -> Callable[[jax.Array], jax.Array]:
    """Solver for (..., nx, nz) cell-centered RHS -> pressure, zero-mean mode.

    TPU-first formulation: the horizontal transform is a real-DFT *matmul*
    (an nx x nx matrix), not an FFT — at these sizes a single MXU pass beats
    the XLA FFT by ~4x and fuses into the modal-inverse einsum. The whole
    solve is three back-to-back matmuls.
    """
    f_mat, g_mat, row_modes = _real_dft_matrices(nx)
    lams = _dft_eigenvalues(nx, dx)
    inv = _vertical_inverses(lams, nz, dz)  # (nx//2+1, nz, nz)
    inv_rows = inv[row_modes]  # (nx, nz, nz): per DFT row

    f_mat = jnp.asarray(f_mat, dtype)
    g_mat = jnp.asarray(g_mat, dtype)
    inv_rows = jnp.asarray(inv_rows, dtype)

    def solve(rhs: jax.Array) -> jax.Array:
        rhat = jnp.einsum("mx,...xz->...mz", f_mat, rhs, precision=_HIGHEST)
        phat = jnp.einsum("...mz,mzf->...mf", rhat, inv_rows,
                          precision=_HIGHEST)
        return jnp.einsum("xm,...mf->...xf", g_mat, phat, precision=_HIGHEST)

    return solve


def make_poisson_solver_2d_bm(
    nx: int, nz: int, dx: float, dz: float, dtype=jnp.float32,
    precision=None,
) -> Callable[[jax.Array], jax.Array]:
    """Batch-minor variant: RHS shaped (nx, nz, E) with the env axis minor.

    Identical math to ``make_poisson_solver_2d`` but with every matmul laid
    out so the env axis stays in the TPU lane dimension: the modal inverse is
    a batched (nx) matmul (nz, nz) @ (nz, E).
    """
    f_mat, g_mat, row_modes = _real_dft_matrices(nx)
    lams = _dft_eigenvalues(nx, dx)
    inv_rows = _vertical_inverses(lams, nz, dz)[row_modes]  # (nx, nz, nz)

    f_mat = jnp.asarray(f_mat, dtype)
    g_mat = jnp.asarray(g_mat, dtype)
    # inv_rows[m, f, z]: output row f, contraction z
    inv_rows = jnp.asarray(np.swapaxes(inv_rows, -1, -2), dtype)
    prec = precision if precision is not None else _HIGHEST

    def solve(rhs: jax.Array) -> jax.Array:
        rhat = jnp.einsum("mx,xze->mze", f_mat, rhs, precision=prec)
        phat = jnp.einsum("mfz,mze->mfe", inv_rows, rhat, precision=prec)
        return jnp.einsum("xm,mfe->xfe", g_mat, phat, precision=prec)

    return solve


def _dct2_matrices(nz: int, dz: float):
    """DCT-II eigenbasis of the Neumann vertical second difference.

    The tridiagonal Neumann operator built in ``_vertical_inverses`` (ghost
    cells p[-1]=p[0], p[nz]=p[nz-1]) is exactly diagonalized by the DCT-II
    vectors v_k[j] = cos(pi k (j+1/2)/nz) with eigenvalues
    lam_k = -(2 - 2 cos(pi k / nz)) / dz^2. Returns (analysis C (nz, nz),
    synthesis S (nz, nz) with S @ C = I, eigenvalues (nz,)).

    This turns the per-horizontal-mode vertical *solve* into an elementwise
    reciprocal in (kx, ky, kz) space — the TPU-friendly form: transforms are
    dense MXU matmuls, the inverse is a VPU multiply, and the singular mean
    mode is handled by zeroing its coefficient (identical to the pinv's
    zero-mean solution, since the basis is orthogonal).
    """
    j = np.arange(nz)
    k = np.arange(nz)
    c = np.cos(np.pi * np.outer(k, j + 0.5) / nz)  # (k, j)
    scale = np.full(nz, 2.0 / nz)
    scale[0] = 1.0 / nz
    s = (c * scale[:, None]).T  # (j, k)
    assert np.allclose(s @ c, np.eye(nz), atol=1e-10)
    lam = -(2.0 - 2.0 * np.cos(np.pi * k / nz)) / (dz * dz)
    return c, s, lam


# Above this (nx*nz) the dense kron analysis loses to the factored
# rectangular transforms: the dense matmul costs 4*nx*nz flops/point/solve
# (quadratic in the transform size) vs the factored 4*(nx+nz), and the
# measured crossover on this image sits between the training grid
# (nx*nz=512, where the one full-utilization dense matmul wins) and the
# 32x64x64 flowstats grid (nx*nz=2048, where it is a >10x flop loss) —
# docs/PERF_NOTES_3D.md round-4 "future levers" #2, built in round 5.
FACTORED_POISSON_MIN_NXNZ = 1024


def make_poisson_solver_3d_bm(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    dtype=jnp.float32,
    precision=None,
    factored: bool | None = None,
):
    """Batch-minor 3D solver: RHS (nx, nz, ny, E) -> pressure, zero-mean mode.

    Fully spectral (real DFT in x and y, DCT-II in z). Two algebraically
    identical forms of the (x,z) transform pair, selected by ``factored``:

    * dense (default below ``FACTORED_POISSON_MIN_NXNZ``): x-DFT and z-DCT
      combine into ONE dense (nx*nz, nx*nz) analysis matrix applied over
      the merged leading axes — a single full-utilization MXU matmul.
      Best when the merged transform is small (the 128-deep systolic
      contraction is fed a 512-wide dense operand on the training grid).
    * factored (default above): the x-DFT and z-DCT stay two rectangular
      matmuls, (nx, nx) and (nz, nz), cutting the transform flops from
      O((nx*nz)^2) to O(nx^2*nz + nz^2*nx) per column — the form that
      scales to the reference's 32x64x64 flowstats grid and beyond.

    In both forms the y-DFT is a batched contraction of the sublane axis
    and the modal solve is an elementwise multiply; the mean mode of the
    singular Neumann system gets the zero-mean solution. The env axis
    stays in the TPU lanes throughout.
    """
    if factored is None:
        factored = nx * nz >= FACTORED_POISSON_MIN_NXNZ
    fx, gx, rows_x = _real_dft_matrices(nx)
    lx = _dft_eigenvalues(nx, dx)[rows_x]  # (nx,) per DFT row
    fy, gy, rows_y = _real_dft_matrices(ny)
    ly = _dft_eigenvalues(ny, dy)[rows_y]  # (ny,)
    cz, sz, lz = _dct2_matrices(nz, dz)

    lam = lx[:, None, None] + lz[None, :, None] + ly[None, None, :]
    with np.errstate(divide="ignore"):
        dinv = np.where(np.abs(lam) < 1e-12, 0.0, 1.0 / lam)
    dinv = dinv.reshape(nx * nz, ny)

    prec = precision if precision is not None else _HIGHEST

    if factored:
        fx_j = jnp.asarray(fx, dtype)
        gx_j = jnp.asarray(gx, dtype)
        cz_j = jnp.asarray(cz, dtype)
        sz_j = jnp.asarray(sz, dtype)
        fy_j = jnp.asarray(fy, dtype)
        gy_j = jnp.asarray(gy, dtype)
        dinv_j = jnp.asarray(dinv, dtype)

        def solve(rhs: jax.Array) -> jax.Array:
            e = rhs.shape[-1]
            q = jnp.einsum("kz,xzye->xkye", cz_j, rhs, precision=prec)
            q = jnp.einsum("mx,xkye->mkye", fx_j, q, precision=prec)
            q = q.reshape(nx * nz, ny, e)
            q = jnp.einsum("ly,Kye->Kle", fy_j, q, precision=prec)
            q = q * dinv_j[:, :, None]
            q = jnp.einsum("yl,Kle->Kye", gy_j, q, precision=prec)
            q = q.reshape(nx, nz, ny, e)
            q = jnp.einsum("xm,mkye->xkye", gx_j, q, precision=prec)
            return jnp.einsum("zk,xkye->xzye", sz_j, q, precision=prec)

        return solve

    # row (kx kz) x col (x z), x-major merge == reshape(nx, nz) order
    t_a = np.kron(fx, cz)  # (nx*nz, nx*nz)
    t_s = np.kron(gx, sz)

    t_a_j = jnp.asarray(t_a, dtype)
    tail = _make_poisson_tail_3d_bm(nx, ny, nz, t_s, fy, gy, dinv, dtype,
                                    prec)

    def solve(rhs: jax.Array) -> jax.Array:
        e = rhs.shape[-1]
        q = rhs.reshape(nx * nz, ny, e)
        rhat = jnp.einsum("KM,Mye->Kye", t_a_j, q, precision=prec)
        return tail(rhat)

    return solve


def _make_poisson_tail_3d_bm(nx, ny, nz, t_s, fy, gy, dinv, dtype,
                             precision=None):
    t_s = jnp.asarray(t_s, dtype)
    fy_ = jnp.asarray(fy, dtype)
    gy_ = jnp.asarray(gy, dtype)
    dinv = jnp.asarray(dinv, dtype)
    prec = precision if precision is not None else _HIGHEST

    def tail(rhat: jax.Array) -> jax.Array:
        """Finish the solve from ``rhat = T_A @ rhs`` (the (x,z)-modal
        analysis): y-DFT, elementwise modal reciprocal, inverse y-DFT,
        (x,z) synthesis. ``rhat``: (nx*nz, ny, E) -> (nx, nz, ny, E)."""
        e = rhat.shape[-1]
        rhat = jnp.einsum("ly,Kye->Kle", fy_, rhat, precision=prec)
        phat = rhat * dinv[:, :, None]
        p = jnp.einsum("yl,Kle->Kye", gy_, phat, precision=prec)
        p = jnp.einsum("MK,Kye->Mye", t_s, p, precision=prec)
        return p.reshape(nx, nz, ny, e)

    return tail


def poisson_analysis_matrix_3d(nx: int, nz: int) -> np.ndarray:
    """The (x,z)-modal analysis matrix T_A = kron(Fx, Cz), float64.

    ``rhat = T_A @ rhs.reshape(nx*nz, ...)`` with x-major row merge — the
    first einsum of ``make_poisson_solver_3d_bm``. Exposed so the Pallas
    stage kernel can accumulate the analysis over its x-blocks on the MXU
    (column block i of T_A pairs with x-block i of the divergence) and
    emit ``rhat`` directly; ``make_poisson_tail_3d_bm`` then finishes the
    solve."""
    fx, _, _ = _real_dft_matrices(nx)
    cz, _, _ = _dct2_matrices(nz, 1.0)  # dz only enters eigenvalues
    return np.kron(fx, cz)


def make_poisson_tail_3d_bm(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    dtype=jnp.float32,
    precision=None,
):
    """Tail of the batch-minor 3D solve for callers that already hold
    ``rhat`` (see ``poisson_analysis_matrix_3d``)."""
    _, gx, rows_x = _real_dft_matrices(nx)
    lx = _dft_eigenvalues(nx, dx)[rows_x]
    fy, gy, rows_y = _real_dft_matrices(ny)
    ly = _dft_eigenvalues(ny, dy)[rows_y]
    _, sz, lz = _dct2_matrices(nz, dz)
    t_s = np.kron(gx, sz)
    lam = lx[:, None, None] + lz[None, :, None] + ly[None, None, :]
    with np.errstate(divide="ignore"):
        dinv = np.where(np.abs(lam) < 1e-12, 0.0, 1.0 / lam)
    dinv = dinv.reshape(nx * nz, ny)
    return _make_poisson_tail_3d_bm(nx, ny, nz, t_s, fy, gy, dinv, dtype,
                                    precision)


def make_poisson_solver_3d(
    nx: int,
    ny: int,
    nz: int,
    dx: float,
    dy: float,
    dz: float,
    dtype=jnp.float32,
) -> Callable[[jax.Array], jax.Array]:
    """Solver for (..., nx, ny, nz) RHS; rfft over x, fft over y."""
    lx = _dft_eigenvalues(nx, dx)  # (Mx,) rfft modes
    my = np.arange(ny)
    ly = -(2.0 - 2.0 * np.cos(2.0 * np.pi * my / ny)) / (dy * dy)  # full fft
    lam2d = lx[:, None] + ly[None, :]  # (Mx, ny)
    inv = jnp.asarray(
        _vertical_inverses(lam2d.ravel(), nz, dz).reshape(lx.size, ny, nz, nz),
        dtype=dtype,
    )

    def solve(rhs: jax.Array) -> jax.Array:
        rhat = jnp.fft.fft(jnp.fft.rfft(rhs, axis=-3), axis=-2)  # (..., Mx, ny, nz)
        pr = jnp.einsum("...myz,myzf->...myf", jnp.real(rhat).astype(dtype), inv,
                        precision=_HIGHEST)
        pi = jnp.einsum("...myz,myzf->...myf", jnp.imag(rhat).astype(dtype), inv,
                        precision=_HIGHEST)
        phat = jax.lax.complex(pr, pi)
        out = jnp.fft.irfft(jnp.fft.ifft(phat, axis=-2), n=nx, axis=-3)
        return out.astype(dtype)

    return solve
