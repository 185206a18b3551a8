"""REAL multi-process distributed runtime test (SURVEY §2.7 / §5.8).

Spawns two OS processes that join a jax.distributed cluster on the CPU
backend (4 virtual devices each -> 8 global), build the ('host', 'env')
mesh, step the sharded 2D vector env, and run one full PPO iteration as
one SPMD program — the same code path as a TPU pod launch
(scripts/launch_multihost.sh), minus the hardware. The gathered rewards
and post-update params must agree with a single-process run of the
identical program to f32 rounding tolerance (multi-process XLA partitions
and schedules reductions differently, so bit-exactness is not expected;
measured disagreement is ~1e-7).
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
            gathered[i], np.asarray(ts.reward), rtol=0, atol=1e-6,
            err_msg=f"step {i}: 2-process SPMD != single-process",
        )

    # ---- distributed PPO update parity --------------------------------
    # (a) both processes hold IDENTICAL params after the update (the
    # gradient psum is a collective — divergence here means the DCN-axis
    # reduction is broken);
    p0 = np.load(str(out) + ".params0.npz")
    p1 = np.load(str(out) + ".params1.npz")
    assert set(p0.files) == set(p1.files) and p0.files
    for k in p0.files:
        np.testing.assert_array_equal(
            p0[k], p1[k],
            err_msg=f"param {k}: processes diverged after one PPO update",
        )

    # (b) the distributed update equals a single-process 8-device run of
    # the same program to f32 tolerance.
    from rbc_gym_tpu.models import RBCActorCritic2D
    from rbc_gym_tpu.rl import PPO, PPOConfig
    from rbc_gym_tpu.parallel import shard_ppo_trainer

    trainer = PPO(
        RBC2DVectorEnv(
            num_envs=16,
            state_shape=(16, 32),
            observation_shape=(8, 16),
            heater_duration=0.3,
            episode_length=3.0,
        ),
        RBCActorCritic2D(n_heaters=12),
        PPOConfig(n_steps=2, n_epochs=2, n_minibatches=2),
        seed=0,
    )
    trainer = shard_ppo_trainer(trainer, make_host_env_mesh())
    trainer.learn(1)
    ref_leaves = jax.tree_util.tree_leaves(trainer.train_state.params)
    assert len(ref_leaves) == len(p0.files)
    for i, leaf in enumerate(ref_leaves):
        ref = np.asarray(leaf)
        got = p0[f"p{i}"]
        np.testing.assert_allclose(
            got, ref, rtol=0, atol=2e-6,
            err_msg=f"param leaf {i}: distributed != single-process update",
        )
