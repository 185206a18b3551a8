"""REAL multi-process distributed runtime test (SURVEY §2.7 / §5.8).

Spawns two OS processes that join a jax.distributed cluster on the CPU
backend (4 virtual devices each -> 8 global), build the ('host', 'env')
mesh, and step the sharded 2D vector env as one SPMD program — the same
code path as a TPU pod launch (scripts/launch_multihost.sh), minus the
hardware. The gathered rewards must match a single-process run of the
identical env bit-for-bit (same program, same seed, same device count).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_env_step(tmp_path):
    port = _free_port()
    out = tmp_path / "rewards.npy"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(port), str(pid), str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    gathered = np.load(out)
    assert gathered.shape == (3, 16)

    # single-process reference on this process's own 8 virtual devices
    import jax
    import jax.numpy as jnp

    from rbc_gym_tpu.envs.vector2d import RBC2DVectorEnv
    from rbc_gym_tpu.parallel import make_host_env_mesh, shard_vector_env

    env1 = shard_vector_env(
        RBC2DVectorEnv(
            num_envs=16,
            state_shape=(16, 32),
            observation_shape=(8, 16),
            heater_duration=0.3,
            episode_length=3.0,
        ),
        make_host_env_mesh(),
    )
    state, _ = env1.reset(jax.random.PRNGKey(0))
    for i in range(3):
        state, ts = env1.step(state, jnp.full((16, 12), 0.1 * i, jnp.float32))
        # Multi-process XLA partitions/schedules reductions differently, so
        # agreement is to f32 rounding (measured ~1e-7), not bit-exact.
        np.testing.assert_allclose(
            gathered[i], np.asarray(ts.reward), rtol=0, atol=1e-5,
            err_msg=f"step {i}: 2-process SPMD != single-process",
        )
