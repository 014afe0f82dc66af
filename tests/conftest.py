"""Test configuration: force CPU platform with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs multi-chip via __graft_entry__.dryrun_multichip)."""

import os

# Must run before jax import anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent XLA compile cache: the suite's cost is dominated by CPU jit
# compiles of per-curve ladder/Straus kernels; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/libecc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import random

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    r = random.Random(0xECC)
    return r
