"""Test configuration.

This image's sitecustomize imports JAX at interpreter startup and — when
the axon TPU tunnel is up — calls jax.config.update("jax_platforms",
"axon,cpu"), CLOBBERING any JAX_PLATFORMS env var.  Env vars therefore
cannot select the backend; only jax.config.update post-import can.

Tests default to the REAL CPU backend: the tunneled TPU pays ~100-200 s
of first-touch warm-up per process plus ~0.4 s per host fetch, which
made the round-1 "on-TPU" test runs pathologically slow.  On-chip
verification happens through bench.py and the driver's entry()
compile-check instead.  Set SNARK_TEST_PLATFORM=default to run the
suite on whatever backend sitecustomize selected (e.g. a deliberate
on-TPU correctness pass), or =tpu / =axon explicitly.
"""

import os
from pathlib import Path

# 8 MB pthread stacks overflow in the XLA:CPU compiler on G2-sized
# graphs; use the SAME proven 2 GB limit as every entry point
# (config.raise_stack_limit — 256 MB was not enough for the composite
# sharded prove-step program)
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from snark_challenge_prover_tpu.config import raise_stack_limit

raise_stack_limit()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Compile-speed flags (tests are correctness checks; generated-code
# quality is irrelevant): 4x faster XLA:CPU compiles, measured on the
# dryrun stage programs.  MUST stay in sync with
# __graft_entry__._force_cpu_devices so cache entries are shared.
if "xla_cpu_use_fusion_emitters" not in flags:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_use_fusion_emitters=false"
        " --xla_llvm_disable_expensive_passes=true"
    )

import jax

_plat = os.environ.get("SNARK_TEST_PLATFORM", "cpu")
if _plat != "default":
    jax.config.update("jax_platforms", _plat)

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
