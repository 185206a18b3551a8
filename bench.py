"""Headline benchmark: lockstep env throughput on one TPU chip.

Baseline (BASELINE.md): the reference steps ONE env at 0.12 s/step for
dt=1.0 of sim time (~33 RK3 substeps at dt_solver=0.03) on Apple Silicon.
We measure the batched pure-JAX env at the same resolution (96x64) and
normalize to the same unit of work: seconds per env-step *per unit sim
time*, i.e. our heater_duration=1.5 steps (50 substeps) count as 1.5x the
baseline step. (Raw per-step ratio = vs_baseline / 1.5.)

Prints JSON lines, one per metric; the HEADLINE 2D metric is the LAST
line. A 3D line (training config, 16x32x32, whole-stage Pallas kernel) is
printed first; the reference publishes no 3D timing, so its vs_baseline
is null. Before timing, a device-side fused-vs-XLA parity check guards
against silent Mosaic lowering regressions (skip: BENCH_SKIP_PARITY=1).
"""

import json
import os
import sys
import time

import jax

# Persistent compile cache: the fused whole-env-step Pallas kernel takes
# minutes to compile cold; cache hits bring bench startup to seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv

BASELINE_SEC_PER_SIMTIME = 0.12  # README.md:62 — one env, dt=1.0 sim time

# Spectral-solve MXU precision for the benched envs. "high" (bf16x3) is
# ~f32-accurate (q rel-err 3.3e-5; steady-Nu drift validated below the
# flow's own CI — docs/PERF_NOTES_3D.md round-4) and ~2x the HIGHEST
# matmul rate; the fused-vs-XLA parity gate below runs at the SAME
# precision, so the headline always ships with its own config checked.
# Override with BENCH_POISSON_PRECISION=highest for the exact-f32 path.
POISSON_PRECISION = os.environ.get("BENCH_POISSON_PRECISION", "high")


def _roofline(kind: str, env_steps_per_sec: float, **cfg) -> dict:
    """MFU/roofline fields (vpu_utilization_pct, hbm_utilization_pct) from
    the XLA-cost-analysis work model (utils/roofline.py). Never fails the
    bench — utilization is reporting, not gating."""
    try:
        from rbc_gym_tpu.utils import roofline as rl

        cost = (rl.xla_cost_2d if kind == "2d" else rl.xla_cost_3d)(**cfg)
        return rl.roofline_metrics(cost, env_steps_per_sec)
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"bench: roofline model failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        return {}


def run(num_envs: int, steps: int = 10) -> dict:
    env = RBC2DVectorEnv(
        num_envs=num_envs,
        rayleigh_number=10_000,
        state_shape=(64, 96),
        observation_shape=(8, 48),
        heater_duration=1.5,
        episode_length=300,
        poisson_precision=POISSON_PRECISION,
    )
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    actions = jnp.zeros((num_envs, 12), jnp.float32)

    # warmup/compile
    state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, ts = env.step(state, actions)
    jax.block_until_ready(ts.reward)
    elapsed = time.perf_counter() - t0

    env_steps_per_sec = num_envs * steps / elapsed
    sec_per_env_step = elapsed / (num_envs * steps)
    # normalize to baseline unit of work (heater_duration 1.5 vs dt 1.0)
    sec_per_env_simtime = sec_per_env_step / 1.5
    return {
        "metric": "env_steps_per_sec_2d_96x64",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(BASELINE_SEC_PER_SIMTIME / sec_per_env_simtime, 1),
        "num_envs": num_envs,
        "sec_per_env_step": sec_per_env_step,
        "poisson_precision": POISSON_PRECISION,
        **_roofline("2d", env_steps_per_sec, state_shape=(64, 96),
                    ra=10_000.0, heater_duration=1.5),
    }


def run3d(num_envs: int, steps: int = 10, state_shape=(16, 32, 32),
          dt_solver: float = 0.01, sync_each_step: bool = False,
          auto_reset: bool = True) -> dict:
    from rbc_gym_tpu.envs.vector3d import RBC3DVectorEnv

    env = RBC3DVectorEnv(
        num_envs=num_envs,
        rayleigh_number=2500,
        state_shape=state_shape,
        heater_duration=0.125,
        dt_solver=dt_solver,
        episode_length=37.5,
        poisson_precision=POISSON_PRECISION,
        auto_reset=auto_reset,
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((num_envs, 8, 8), jnp.float32)
    state, ts = env.step(state, actions)  # warmup/compile
    jax.block_until_ready(ts.reward)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, ts = env.step(state, actions)
        if sync_each_step:
            # big grids: an unsynced loop queues multiple in-flight
            # frames, each holding ~10 GB of field/obs buffers — the
            # async pile-up OOMs HBM even though one frame fits. The
            # ~ms sync cost is noise against the ~2 s batch step.
            jax.block_until_ready(ts.reward)
    jax.block_until_ready(ts.reward)
    elapsed = time.perf_counter() - t0
    env_steps_per_sec = num_envs * steps / elapsed
    nz, ny, nx = state_shape
    return {
        "metric": f"env_steps_per_sec_3d_{nz}x{ny}x{nx}",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": None,  # reference publishes no 3D timing
        "num_envs": num_envs,
        "sec_per_env_step": elapsed / (num_envs * steps),
        "poisson_precision": POISSON_PRECISION,
        "auto_reset": auto_reset,
        **_roofline("3d", env_steps_per_sec, state_shape=state_shape,
                    ra=2500.0, heater_duration=0.125, dt_solver=dt_solver),
    }


def main():
    if os.environ.get("BENCH_SKIP_PARITY", "0") != "1":
        # Device-side Pallas-vs-XLA parity: a Mosaic lowering regression
        # must fail the bench, not ship inside a headline number.
        from rbc_gym_tpu.utils.parity import fused_parity_2d, fused_parity_3d

        err2 = fused_parity_2d(num_envs=128, steps=1,
                               poisson_precision=POISSON_PRECISION)
        err3 = fused_parity_3d(num_envs=128, steps=1,
                               poisson_precision=POISSON_PRECISION)
        print(f"bench: pallas parity ok (2d {err2:.2e}, 3d {err3:.2e}, "
              f"poisson_precision={POISSON_PRECISION})", file=sys.stderr)

    ok3d = False
    attempted_3d = int(os.environ.get("BENCH_ENVS_3D", 4096))
    for num_envs in (attempted_3d, 1024, 256):
        try:
            result = run3d(num_envs)
            # A silent drop to a smaller fleet must be visible in
            # BENCH_r*.json, not only on stderr (verdict r2, fix #6).
            result["num_envs_attempted"] = attempted_3d
            result["degraded"] = num_envs != attempted_3d
            print(json.dumps(result), flush=True)
            ok3d = True
            break
        except Exception as e:
            print(f"bench3d: {num_envs} envs failed ({type(e).__name__}: {e}), "
                  f"retrying smaller", file=sys.stderr)
    if not ok3d:
        print("bench3d: ALL sizes failed — no 3D metric emitted",
              file=sys.stderr)

    # Big-grid 3D line: the 32x64x64 flowstats-protocol grid (dt 0.005),
    # served by the (x,y)-blocked Element-window stage kernel + factored
    # spectral Poisson (round 5; x4/y8/double auto-geometry). Each
    # attempt runs in a SUBPROCESS with a hard timeout: a Pallas scoped-VMEM OOM on this
    # image surfaces as an endlessly-retried remote-compile HTTP 500
    # (PERF_NOTES_3D findings) — an in-process try/except cannot catch a
    # hang, and this line must never stall an unattended bench run.
    import subprocess

    attempted_big = int(os.environ.get("BENCH_ENVS_3D_BIG", 1024))
    for num_envs in (attempted_big, 256, 64):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", "3d_big", str(num_envs)],
                capture_output=True, text=True,
                timeout=int(os.environ.get("BENCH_BIG_TIMEOUT", 1500)),
            )
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("{")), None)
            if proc.returncode == 0 and line:
                result = json.loads(line)
                result["num_envs_attempted"] = attempted_big
                result["degraded"] = num_envs != attempted_big
                print(json.dumps(result), flush=True)
                break
            print(f"bench3d-big: {num_envs} envs failed "
                  f"(rc={proc.returncode}): "
                  f"{proc.stderr.strip().splitlines()[-1:] or '?'}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench3d-big: {num_envs} envs timed out "
                  "(likely VMEM-OOM compile retry loop), retrying smaller",
                  file=sys.stderr)
    else:
        print("bench3d-big: ALL sizes failed — no 32x64x64 metric emitted",
              file=sys.stderr)

    # 64^3 VMEM-feasibility probe (diagnostic, small fleet): OPT-IN via
    # BENCH_64CUBE=1 — a VMEM OOM on this image surfaces as an
    # endlessly-retried remote-compile HTTP 500 (see PERF_NOTES_3D
    # findings), which would hang an unattended bench run. The measured
    # feasibility result is recorded in docs/PERF_NOTES_3D.md instead.
    if os.environ.get("BENCH_64CUBE", "0") == "1":
        try:
            # >= 128 envs: the Pallas paths need full 128-lane env blocks —
            # at 64 envs the solver silently falls back to XLA (round-4's
            # 16.1 env-steps/s probe was that fallback; the round-5
            # (x,y)-blocked kernel does 47.4 @256).
            result = run3d(256, steps=3, state_shape=(64, 64, 64),
                           dt_solver=0.005, sync_each_step=True,
                           auto_reset=False)
            result["num_envs_attempted"] = 256
            result["note"] = "feasibility probe, not a throughput headline"
            print(json.dumps(result), flush=True)
        except Exception as e:
            print(f"bench3d-64cube probe failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    attempted = int(os.environ.get("BENCH_ENVS", 4096))
    for num_envs in (attempted, 2048, 1024, 256):
        try:
            result = run(num_envs)
            result["num_envs_attempted"] = attempted
            result["degraded"] = num_envs != attempted
            print(json.dumps(result))
            return
        except Exception as e:  # OOM fallback to smaller fleets
            print(f"bench: {num_envs} envs failed ({type(e).__name__}), "
                  f"retrying smaller", file=sys.stderr)
    raise SystemExit("bench failed at all sizes")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--one" and sys.argv[2] == "3d_big":
        # subprocess worker for the hang-guarded big-grid line; gates on
        # the (x,y)-blocked stage kernel's own Mosaic parity first
        if os.environ.get("BENCH_SKIP_PARITY", "0") != "1":
            from rbc_gym_tpu.utils.parity import fused_parity_3d

            err = fused_parity_3d(num_envs=128, steps=1,
                                  state_shape=(32, 64, 64),
                                  fused="stage_xy",
                                  poisson_precision=POISSON_PRECISION)
            print(f"bench3d-big: stage_xy parity ok ({err:.2e})",
                  file=sys.stderr)
        # auto_reset=False: no episode truncates inside the 11-step
        # bench window, so the measured work is identical — but the
        # autoreset lax.cond's reserved branch buffers (fresh-IC fields +
        # masked swaps that never execute) break HBM at 1024 envs on this
        # grid. Recorded in the JSON line.
        result = run3d(int(sys.argv[3]), state_shape=(32, 64, 64),
                       dt_solver=0.005, sync_each_step=True,
                       auto_reset=False)
        print(json.dumps(result), flush=True)
    else:
        main()
