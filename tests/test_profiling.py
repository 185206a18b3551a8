"""Tests for the first-class profiling hooks (rbc_gym_tpu.utils.profiling)."""

import glob
import os

import jax
import jax.numpy as jnp

from rbc_gym_tpu.utils import profiling


def test_step_timer_summary():
    timer = profiling.StepTimer(skip_first=1)
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    for _ in range(5):
        with timer:
            y = f(x)
            timer.sink(y)
    s = timer.summary()
    assert s["n"] == 4  # first iteration skipped
    assert s["mean_ms"] > 0
    assert s["p95_ms"] >= s["p50_ms"]
    assert s["steps_per_sec"] > 0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    f = jax.jit(lambda a: (a * 2).sum())
    with profiling.trace(logdir):
        with profiling.annotate("hot_region"):
            f(jnp.arange(128.0)).block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(p) for p in files)


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())
    assert all(isinstance(v, dict) for v in stats.values())
