"""3D env throughput microbench: whole-stage vs per-field Pallas paths.

Usage: python scripts/bench3d.py [stage|field|xla] [num_envs ...]
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

from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv


def run(fused, num_envs, steps=10):
    env = RBC3DVectorEnv(
        num_envs=num_envs,
        rayleigh_number=2500,
        state_shape=(16, 32, 32),
        heater_duration=0.125,
        dt_solver=0.01,
        episode_length=37.5,
        fused=fused,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, 8, 8), jnp.float32)

    t0 = time.perf_counter()
    state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    elapsed = time.perf_counter() - t0
    eps = num_envs * steps / elapsed
    print(
        f"fused={fused!r:8} envs={num_envs:5d}: {eps:9.1f} env-steps/s "
        f"({elapsed/steps*1e3:8.2f} ms/batch-step, compile+1 {compile_s:.1f}s)",
        flush=True,
    )
    assert np.isfinite(np.asarray(ts.reward)).all()
    return eps


if __name__ == "__main__":
    fused = sys.argv[1] if len(sys.argv) > 1 else "stage"
    sizes = [int(a) for a in sys.argv[2:]] or [1024, 4096]
    if fused == "xla":
        fused = False
    elif os.environ.get("BENCH_SKIP_PARITY", "0") != "1":
        # device-side Mosaic-lowering parity guard (round-1 verdict #5)
        from rbc_gym_tpu.utils.parity import fused_parity_3d

        err = fused_parity_3d(num_envs=128, steps=1, fused=fused)
        print(f"pallas parity ok (fused={fused!r}: {err:.2e})", flush=True)
    for n in sizes:
        run(fused, n)
