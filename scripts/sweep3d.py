#!/usr/bin/env python
"""Stage-kernel parameter sweep: x_blk and pipeline buffering.

PERF_NOTES_3D.md's roadmap (round-3 lever): the stage kernel is bound by
VMEM-materialized intermediates; block geometry and pipeline buffering
trade halo-read overhead, DMA/compute overlap, and VMEM headroom. This
sweeps x_blk x single_buffer at the bench config (16x32x32, 13 substeps)
and prints env-steps/s.

Usage: python scripts/sweep3d.py [num_envs] [steps] [nz ny nx [dt_solver]] [--fused=stage|stage_qp]

The optional grid args sweep other shapes (e.g. the 32x64x64 flowstats
grid at dt 0.005, where VMEM pressure forces different geometry than the
training grid — round-3 verdict #5); buffering modes include the mixed
halo/center variants.
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

from rbc_gym_tpu.sim.grid import Grid3D
from rbc_gym_tpu.sim.solver3d import SimParams3D, make_solver3d


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    fused = "stage"
    for a in sys.argv[1:]:
        if a.startswith("--fused="):
            fused = a.split("=", 1)[1]
    num_envs = int(argv[0]) if len(argv) > 0 else 4096
    steps = int(argv[1]) if len(argv) > 1 else 10
    nz, ny, nx = (
        (int(argv[2]), int(argv[3]), int(argv[4]))
        if len(argv) > 4 else (16, 32, 32)
    )
    dt_solver = float(argv[5]) if len(argv) > 5 else 0.01

    grid = Grid3D(nx=nx, ny=ny, nz=nz, lx=4 * np.pi, ly=4 * np.pi, lz=2.0)
    params = SimParams3D(ra=2500, heater_duration=0.125, dt_solver=dt_solver)

    key = jax.random.PRNGKey(0)
    actions = jnp.zeros((num_envs, 8, 8), jnp.float32)

    for x_blk in (4, 8, 16, 32):
        for single in (True, False, "mixed", "halo_double"):
            try:
                solver = make_solver3d(
                    grid, params, fused=fused, x_blk=x_blk,
                    single_buffer=single,
                )
                fields = solver.init_random(key, batch_shape=(num_envs,))
                step = jax.jit(solver.env_step)
                f = step(fields, actions)
                jax.block_until_ready(f.b)
                t0 = time.perf_counter()
                for _ in range(steps):
                    f = step(f, actions)
                jax.block_until_ready(f.b)
                dt = time.perf_counter() - t0
                print(f"x_blk={x_blk:2d} single_buffer={single!s:12}: "
                      f"{num_envs * steps / dt:8.1f} env-steps/s", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                print(f"x_blk={x_blk:2d} single_buffer={single!s:12}: FAILED "
                      f"({type(e).__name__}: {msg})", flush=True)


if __name__ == "__main__":
    main()
