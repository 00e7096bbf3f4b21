"""Test configuration.

This image's sitecustomize imports JAX at interpreter startup (axon TPU
plugin), so config defaults are frozen before any env var set here
could be read — all knobs must go through jax.config.update, which works
post-import.

Tests run on the default backend (the real TPU chip when the axon
tunnel is up — compute correctness is then verified on target
hardware; plain CPU otherwise).  Multi-chip sharding tests explicitly
request the virtual 8-device CPU mesh via jax.devices("cpu"):
XLA_FLAGS is set here, before the CPU client's first initialization,
which is early enough.
"""

import os
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# persistent compilation cache: XLA compiles of the big unrolled bignum
# programs dominate test time; cache them across runs
_cache = Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import random

import numpy as np
import pytest


def cpu_devices(n: int = 8):
    """The virtual CPU mesh devices for sharding tests."""
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)
