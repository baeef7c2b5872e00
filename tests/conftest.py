"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver
separately dry-runs the multi-chip path); the real TPU chip is reserved
for bench.py. The axon TPU plugin pins jax_platforms at interpreter
start, so we must override via jax.config *after* import, before any
backend use.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries: a single-process
    run of the whole suite otherwise accumulates hundreds of XLA-CPU
    executables, under which long runs have hit flaky compiler
    segfaults; per-module clearing keeps the compile arena small at
    the cost of cross-module cache reuse."""
    yield
    jax.clear_caches()
