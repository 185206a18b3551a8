"""First-class tracing / profiling hooks (SURVEY §5.1).

The reference has no built-in observability — timing is external ``timeit``
(reference example/timing.py:19-30) and Slurm ``sacct`` archival. On TPU,
profiling is cheap and structured, so the framework ships with:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard/XProf trace of every XLA computation inside the block.
  * :class:`annotate` — named region annotation that shows up inside traces
    (host + device timeline).
  * :class:`StepTimer` — synchronizing wall-clock timer for env/train steps
    with summary percentiles; the quick answer when a full trace is overkill.
  * :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Dict, List, Optional

import jax

# Named trace region: with annotate("env_step"): ...
annotate = jax.profiler.TraceAnnotation


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device+host profile of the enclosed block to ``logdir``.

    View with TensorBoard's profile plugin or xprof. Synchronizes before
    starting and before stopping so async dispatch doesn't leak work across
    the trace boundary.
    """
    _sync()
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
        _sync()
    finally:
        jax.profiler.stop_trace()


def _sync():
    """Block until all outstanding device computations are finished."""
    for d in jax.devices():
        try:
            d.synchronize_all_activity()  # pjrt-level barrier where available
        except AttributeError:
            pass
    jax.effects_barrier()


class StepTimer:
    """Wall-clock step timer with device synchronization.

    >>> timer = StepTimer()
    >>> for _ in range(100):
    ...     with timer:
    ...         state, ts = env.step(state, actions)
    ...         timer.sink(ts.reward)   # block on a result before stopping
    >>> timer.summary()["p50_ms"]

    ``sink`` is optional but recommended: JAX dispatch is asynchronous, so
    timing without blocking on an output measures only dispatch cost.
    """

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self._skip = skip_first  # discard compile/warmup iterations
        self._t0: Optional[float] = None
        self._sunk = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sink(self, value: Any):
        self._sunk = value

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            if self._sunk is not None:
                jax.block_until_ready(self._sunk)
                self._sunk = None
            dt = time.perf_counter() - self._t0
            if self._skip > 0:
                self._skip -= 1
            else:
                self.times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)

        def pct(p):
            return ts[min(len(ts) - 1, int(p * len(ts)))]

        return {
            "n": len(ts),
            "mean_ms": 1e3 * statistics.fmean(ts),
            "p50_ms": 1e3 * pct(0.50),
            "p95_ms": 1e3 * pct(0.95),
            "max_ms": 1e3 * ts[-1],
            "steps_per_sec": 1.0 / statistics.fmean(ts),
        }


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Live HBM usage per device (empty dict entries where unsupported)."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            k: int(v)
            for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        }
    return out
