"""Probe: UB5 upwind reconstruction as MXU matmuls vs VPU shift+FMA.

The 3D ablation (scripts/ablate3d.py) shows the whole-stage tendency
kernel is VPU compute-bound (~7.6 ms/stage-unit at E=1024): the UB5
reconstructions cost ~400 VPU flops/point. A dense (n, n) stencil matrix
contracted on the MXU does ~2n flops/point but at ~25-50x the VPU's f32
throughput — this probe measures whether XLA-lowered einsum recon beats
the fused-slice VPU recon at the 3D training shape, and checks numerics.

Usage: python scripts/probe_mxu_recon.py [E]
"""

import functools
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

from rbc_gym_tpu.ops import stencils as st

E = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NX, NZ, NY = 32, 16, 32
N_ITER = 39


@functools.lru_cache(maxsize=None)
def periodic_recon_matrices(n: int, m: int):
    """(left, right) (n, n) UB5 periodic reconstruction matrices.

    row j of LEFT = stencil of q-indices for destination j with downwind
    cell m_of_point + j (same convention as st._upwind_periodic).
    """
    left = np.zeros((n, n))
    right = np.zeros((n, n))
    taps_l = ((-3, 2 / 60), (-2, -13 / 60), (-1, 47 / 60), (0, 27 / 60), (1, -3 / 60))
    taps_r = ((2, 2 / 60), (1, -13 / 60), (0, 47 / 60), (-1, 27 / 60), (-2, -3 / 60))
    for j in range(n):
        for off, c in taps_l:
            left[j, (j + m + off) % n] += c
        for off, c in taps_r:
            right[j, (j + m + off) % n] += c
    return left, right


def recon_mxu_x(q, vel, m, precision):
    """UB5 upwind recon along axis 0 of (nx, nz, ny, E) via MXU einsum."""
    L, R = periodic_recon_matrices(q.shape[0], m)
    LR = jnp.asarray(np.stack([L, R]), q.dtype)  # (2, n, n)
    both = jnp.einsum("sij,jzye->sizye", LR, q, precision=precision)
    return jnp.where(vel > 0, both[0], both[1])


def recon_mxu_y(q, vel, m, precision):
    """Same along axis 2 (ny)."""
    L, R = periodic_recon_matrices(q.shape[2], m)
    LR = jnp.asarray(np.stack([L, R]), q.dtype)
    both = jnp.einsum("sij,xzje->sxzie", LR, q, precision=precision)
    return jnp.where(vel > 0, both[0], both[1])


def bench(name, fn, *args):
    f = jax.jit(
        lambda q, v: jax.lax.scan(
            lambda c, _: (fn(c, v) * 0.999 + 0.001 * c, None),
            q, None, length=N_ITER,
        )[0]
    )
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"{name:44}: {ms/N_ITER:7.3f} ms/recon", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (NX, NZ, NY, E), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.float32)

    # numerics: MXU(HIGHEST) vs VPU must agree to float32 roundoff
    ref = st.recon_c2f_periodic(q, vel, -4)
    for prec, label in (
        (jax.lax.Precision.HIGHEST, "HIGHEST"),
        (jax.lax.Precision.DEFAULT, "DEFAULT"),
    ):
        got = recon_mxu_x(q, vel, 0, prec)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"x-recon MXU({label}) vs VPU: max abs err {err:.3e}")

    v1 = jnp.ones_like(q)
    bench("VPU x-recon (fused slices)",
          lambda c, v: st.recon_c2f_periodic(c, v, -4), q, vel)
    bench("MXU x-recon HIGHEST",
          lambda c, v: recon_mxu_x(c, v, 0, jax.lax.Precision.HIGHEST),
          q, vel)
    bench("MXU x-recon DEFAULT",
          lambda c, v: recon_mxu_x(c, v, 0, jax.lax.Precision.DEFAULT),
          q, vel)
    bench("VPU y-recon (fused slices)",
          lambda c, v: st.recon_c2f_periodic(c, v, -2), q, vel)
    bench("MXU y-recon HIGHEST",
          lambda c, v: recon_mxu_y(c, v, 0, jax.lax.Precision.HIGHEST),
          q, vel)
    bench("MXU y-recon DEFAULT",
          lambda c, v: recon_mxu_y(c, v, 0, jax.lax.Precision.DEFAULT),
          q, vel)
    _ = v1


if __name__ == "__main__":
    main()
