"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization instead (SURVEY §2.7).

Note: this image pre-imports jax at interpreter start (sitecustomize), so env
vars are too late — we reconfigure via jax.config before the first backend
initialization instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Physics-parity tests need float64; modules cast to their working dtype.
jax.config.update("jax_enable_x64", True)
