#!/usr/bin/env python
"""Flow statistics vs Rayleigh number (reference experiments/flowstats/
flowstats_ra.py parity): zero-action rollouts of the 3D env across a Ra
sweep, recording per-step Nusselt and per-channel velocity maxima. Output is
a pickle with the reference's record layout plus a JSON summary; these are
the data behind the Nu_max power laws and the Hill w(Ra) fit baked into the
wrappers.

The reference steps one env at a time on CPU; here every Ra in the sweep can
also batch internally (num_envs) for ensemble statistics.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

RA_SWEEP = [500, 750, 1000, 1500, 2000, 4000, 8000, 16000, 32000,
            64000, 128000, 256000, 512000, 1000000]


def perform_experiment(ra, steps, state_shape, dt_solver, heater_duration,
                       num_envs, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    env = RBC3DVectorEnv(
        num_envs=num_envs,
        rayleigh_number=ra,
        state_shape=tuple(state_shape),
        dt_solver=dt_solver,
        heater_duration=heater_duration,
        episode_length=10**9,  # never truncate during the sweep
    )
    state, obs = env.reset(jax.random.PRNGKey(seed))
    actions = jnp.zeros((num_envs, 8, 8))

    @jax.jit
    def step_stats(state):
        state, ts = env.step(state, actions)
        o = ts.obs  # (E, 4, nz, ny, nx)
        maxima = jnp.max(jnp.abs(o), axis=(0, 2, 3, 4))  # per channel
        return state, ts.nusselt.mean(), maxima

    nusselts, max_u, max_v, max_w = [], [], [], []
    for _ in range(steps):
        state, nus, maxima = step_stats(state)
        nusselts.append(float(nus))
        max_u.append(float(maxima[1]))
        max_v.append(float(maxima[2]))
        max_w.append(float(maxima[3]))
    return {
        "ra": ra,
        "nusselt": nusselts,
        "max_u": max_u,
        "max_v": max_v,
        "max_w": max_w,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ra", type=int, nargs="*", default=RA_SWEEP)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--state_shape", type=int, nargs=3, default=[32, 64, 64])
    p.add_argument("--dt_solver", type=float, default=0.005)
    p.add_argument("--heater_duration", type=float, default=0.25)
    p.add_argument("--num_envs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "flowstats_ra.pkl"))
    args = p.parse_args()

    import numpy as np

    records = []
    if os.path.exists(args.out):
        with open(args.out, "rb") as f:
            records = pickle.load(f)

    for ra in args.ra:
        t0 = time.time()
        rec = perform_experiment(
            ra, args.steps, args.state_shape, args.dt_solver,
            args.heater_duration, args.num_envs, args.seed,
        )
        records = [r for r in records if r["ra"] != ra] + [rec]
        with open(args.out, "wb") as f:
            pickle.dump(records, f)
        tail = rec["nusselt"][-100:]
        print(
            f"Ra={ra}: Nu={np.mean(tail):.3f}+-{np.std(tail):.3f} "
            f"max|w|={max(rec['max_w']):.3f} ({time.time()-t0:.1f}s)"
        )

    summary = {
        str(r["ra"]): {
            "nu_mean": float(np.mean(r["nusselt"][-100:])),
            "nu_std": float(np.std(r["nusselt"][-100:])),
            "max_w": float(max(r["max_w"])),
        }
        for r in sorted(records, key=lambda r: r["ra"])
    }
    with open(args.out.replace(".pkl", ".json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
