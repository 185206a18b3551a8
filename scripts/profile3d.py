"""Micro-profile of the 3D substep components on TPU.

Times, at a given env count: the whole-stage Pallas kernel alone, the
per-field kernels alone, the spectral Poisson solve alone, and the full env
step — to locate the wall-clock sink before optimizing.
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

from rbc_gym_tpu.ops.pallas3d import make_field_stage_3d, make_stage_rk_3d
from rbc_gym_tpu.ops.poisson import make_poisson_solver_3d_bm
from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d

E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = 20

grid = Grid3D(nx=32, ny=32, nz=16, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
p = SimParams3D()
nx, ny, nz = grid.nx, grid.ny, grid.nz
dx, dy, dz = grid.dx, grid.dy, grid.dz

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
shape = (nx, nz, ny, E)
u = jax.random.normal(ks[0], shape, jnp.float32) * 0.1
v = jax.random.normal(ks[1], shape, jnp.float32) * 0.1
w = jax.random.normal(ks[2], (nx, nz + 1, ny, E), jnp.float32) * 0.1
b = 1.5 + 0.1 * jax.random.normal(ks[3], shape, jnp.float32)
phy = jax.random.normal(ks[4], shape, jnp.float32) * 0.1
bot = 2.0 + 0.1 * jax.random.normal(ks[5], (nx, ny, E), jnp.float32)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28}: {ms:8.3f} ms", flush=True)
    return ms


stage0, stage1, stage2 = make_stage_rk_3d(
    nx, ny, nz, dx, dy, dz, p.nu, p.kappa, p.min_b
)
dt0 = jnp.float32(0.001)
q0 = jnp.zeros_like(b)
bench("stage-RK kernel (m=0)", lambda *a: stage0(*a), u, v, w, b, q0, bot, dt0)
gp = stage0(u, v, w, b, q0, bot, dt0)[5:]
bench("stage-RK kernel (m=1)",
      lambda *a: stage1(*a[:7], a[7:]), u, v, w, b, q0, bot, dt0, *gp)
bench("stage-RK kernel (m=2)",
      lambda *a: stage2(*a[:7], a[7:]), u, v, w, b, q0, bot, dt0, *gp)

fk = {
    n: make_field_stage_3d(n, nx, ny, nz, dx, dy, dz, p.nu, p.kappa, p.min_b)
    for n in ("u", "v", "w", "b")
}


def fields_all(u, v, w, b, phy, bot):
    return (
        fk["u"](u, v, w, phy),
        fk["v"](u, v, w, phy),
        fk["w"](u, v, w),
        fk["b"](u, v, w, b, bot),
    )


bench("per-field kernels (4x)", fields_all, u, v, w, b, phy, bot)

poisson = make_poisson_solver_3d_bm(nx, ny, nz, dx, dy, dz, jnp.float32)
bench("poisson solve", poisson, u)

solver = make_solver3d(grid, p, dtype=jnp.float32, fused="stage")
f0 = solver.init_random(jax.random.PRNGKey(1), batch_shape=(E,))
act = jnp.zeros((E, 8, 8), jnp.float32)
ms = bench("full env step (stage)", solver.env_step, f0, act)
print(f"  = {ms / (13 * 3):.3f} ms per stage-unit (13 substeps x 3 stages)")

solver_x = make_solver3d(grid, p, dtype=jnp.float32, fused=False)
bench("full env step (pure XLA)", solver_x.env_step, f0, act)
