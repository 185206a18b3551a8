#!/usr/bin/env python
"""2D flow statistics vs Rayleigh number (round-1 verdict item 9).

Zero-action rollouts of the 2D env across the checkpoint-bank Ra ladder,
recording per-step Nusselt and velocity maxima — the 2D analogue of the
reference's 3D flowstats sweep (experiments/flowstats/flowstats_ra.py).
Gives the 2D reward normalizer's Nu_max ~ 0.1*Ra^0.4 constant
(reference wrappers/rbc_normalize_reward.py:20-22) the same empirical
grounding the 3D one has.

Initial conditions come from the reference-generated checkpoint banks when
available (already statistically steady; short equilibration), falling back
to random ICs with the first half of the rollout treated as burn-in.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

RA_SWEEP = [10_000, 30_000, 100_000, 300_000,
            1_000_000, 3_000_000, 10_000_000]
BANK_DIR = "/root/reference/data/checkpoints/train"


def perform_experiment(ra, steps, num_envs, seed, bank_dir):
    import jax
    import jax.numpy as jnp
    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

    bank = os.path.join(bank_dir, f"ckpt_ra{ra}.h5") if bank_dir else None
    if bank and not os.path.exists(bank):
        bank = None
    env = RBC2DVectorEnv(
        num_envs=num_envs,
        rayleigh_number=ra,
        episode_length=10**9,  # never truncate during the sweep
        checkpoint=bank,
    )
    state, _ = env.reset(jax.random.PRNGKey(seed))
    actions = jnp.zeros((num_envs, env.params.n_heaters))

    @jax.jit
    def step_stats(state):
        state, ts = env.step(state, actions)
        f = state.fields
        return state, (
            ts.nusselt_state.mean(),
            jnp.abs(f.u).max(),
            jnp.abs(f.w).max(),
        )

    nus, max_u, max_w = [], [], []
    for _ in range(steps):
        state, (n, mu, mw) = step_stats(state)
        nus.append(float(n))
        max_u.append(float(mu))
        max_w.append(float(mw))
    return {
        "ra": ra,
        "from_bank": bank is not None,
        "nusselt": nus,
        "max_u": max_u,
        "max_w": max_w,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ra", type=int, nargs="*", default=RA_SWEEP)
    p.add_argument("--steps", type=int, default=120,
                   help="env steps (heater_duration=1.5 each)")
    p.add_argument("--tail", type=int, default=60,
                   help="steady-window length for the summary stats")
    p.add_argument("--num_envs", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bank_dir", default=BANK_DIR)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "flowstats_ra_2d.json"))
    args = p.parse_args()

    import numpy as np

    summary = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            summary = json.load(f).get("points", {})

    for ra in args.ra:
        t0 = time.time()
        rec = perform_experiment(
            ra, args.steps, args.num_envs, args.seed, args.bank_dir
        )
        tail_nu = np.array(rec["nusselt"][-args.tail:])
        tail_w = np.array(rec["max_w"][-args.tail:])
        nu_ref = 0.1 * ra ** 0.4  # 2D reward-normalizer Nu_max power law
        summary[str(ra)] = {
            "nu_mean": float(tail_nu.mean()),
            "nu_std": float(tail_nu.std()),
            "nu_max": float(tail_nu.max()),
            "max_w": float(tail_w.max()),
            "from_bank": rec["from_bank"],
            "nu_max_ref_power_law": nu_ref,
            "nu_max_ratio_to_ref": float(tail_nu.max() / nu_ref),
        }
        print(
            f"Ra={ra}: Nu={tail_nu.mean():.3f}+-{tail_nu.std():.3f} "
            f"Nu_max={tail_nu.max():.3f} (0.1*Ra^0.4={nu_ref:.3f}) "
            f"max|w|={tail_w.max():.3f} ({time.time() - t0:.1f}s)"
        )
        with open(args.out, "w") as f:
            json.dump({"protocol": {
                "steps": args.steps, "tail": args.tail,
                "num_envs": args.num_envs, "state_shape": [64, 96],
                "dt_solver": 0.03, "heater_duration": 1.5,
            }, "points": summary}, f, indent=2)

    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
