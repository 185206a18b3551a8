"""Ablation timing of the 3D substep pipeline on TPU.

Each component is timed as a lax.scan of N sequential applications (carry =
fields), so dispatch overhead amortizes and async-dispatch illusions
disappear — the scan's data dependency forces real execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.ops.pallas3d import make_stage_rk_3d
from rbc_gym_tpu.ops.poisson import make_poisson_solver_3d_bm
from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.ops import stencils as st
from rbc_gym_tpu.sim.solver3d import (
    SimParams3D,
    _hydrostatic_pressure,
    make_solver3d,
)

E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = 39  # one env step's worth of stage-units (13 substeps x 3 RK stages)

grid = Grid3D(nx=32, ny=32, nz=16, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
p = SimParams3D()
nx, ny, nz = grid.nx, grid.ny, grid.nz
dx, dy, dz = grid.dx, grid.dy, grid.dz

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
shape = (nx, nz, ny, E)
u = jax.random.normal(ks[0], shape, jnp.float32) * 0.1
v = jax.random.normal(ks[1], shape, jnp.float32) * 0.1
w0 = jax.random.normal(ks[2], (nx, nz + 1, ny, E), jnp.float32) * 0.1
b = 1.5 + 0.1 * jax.random.normal(ks[3], shape, jnp.float32)
bot = 2.0 + 0.1 * jax.random.normal(ks[5], (nx, ny, E), jnp.float32)

stage0, stage1, stage2 = make_stage_rk_3d(
    nx, ny, nz, dx, dy, dz, p.nu, p.kappa, p.min_b
)
poisson = make_poisson_solver_3d_bm(nx, ny, nz, dx, dy, dz, jnp.float32)


def timed(name, body, carry):
    def scan_fn(c, _):
        return body(c), None

    f = jax.jit(lambda c: jax.lax.scan(scan_fn, c, None, length=N)[0])
    out = f(carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(carry)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"{name:34}: {ms:8.2f} ms / {N} iters = {ms/N:7.3f} ms/unit",
          flush=True)


# 1. fused stage-RK kernel alone (stage 0: hydro + tendencies + RK update
# in-kernel; g outputs folded back so the carry stays closed)
def stage_only(c):
    uu, vv, ww, bb = c
    dt = jnp.float32(0.001)
    q0 = jnp.zeros_like(bb)
    uu, vv, ww, bb, dv, gu, gv, gw, gb = stage0(uu, vv, ww, bb, q0, bot, dt)
    return (uu + dt * gu, vv + dt * gv, ww + dt * gw, bb + dt * gb)


# 2. poisson alone
def poisson_only(c):
    uu, vv, ww, bb = c
    pn = poisson(bb)
    return (uu + 0.001 * pn, vv, ww, bb)


# 3. hydrostatic alone
def hydro_only(c):
    uu, vv, ww, bb = c
    phy = _hydrostatic_pressure(bb, dz, p.min_b, 1)
    return (uu, vv, ww, bb + 0.001 * phy)


# 4. divergence + correction alone
def divcorr_only(c):
    uu, vv, ww, bb = c
    div = (
        st.ddx_f2c(uu, dx, 0) + st.ddx_f2c(vv, dy, 2) + st.ddz_f2c(ww, dz, 1)
    )
    pn = poisson(div / 0.001)
    uu = uu - 0.001 * st.ddx_c2f(pn, dx, 0)
    vv = vv - 0.001 * st.ddx_c2f(pn, dy, 2)
    ww = ww - 0.001 * st.ddz_c2f_interior(pn, dz, 1)
    return (uu, vv, ww, bb)


carry = (u, v, w0, b)
try:
    timed("hydro + stage + RK", stage_only, carry)
except Exception as e:
    print("stage_only failed:", type(e).__name__, str(e)[:200])
timed("poisson only", poisson_only, carry)
timed("hydro only", hydro_only, carry)
timed("div + poisson + correction", divcorr_only, carry)

solver = make_solver3d(grid, p, dtype=jnp.float32, fused="stage")
f0 = solver.init_random(jax.random.PRNGKey(1), batch_shape=(E,))
act = jnp.zeros((E, 8, 8), jnp.float32)
sf = jax.jit(solver.env_step)
out = sf(f0, act)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = sf(f0, act)
jax.block_until_ready(out)
ms = (time.perf_counter() - t0) * 1e3
print(f"{'full env step (stage, 39 units)':34}: {ms:8.2f} ms = {ms/N:7.3f} ms/unit")
