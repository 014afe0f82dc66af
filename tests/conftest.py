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

# A remote-TPU plugin (axon) may have been registered by a sitecustomize
# hook that sets jax.config.jax_platforms = "axon,cpu" DIRECTLY, which
# beats the env var above — leaving the default backend on the remote
# chip and silently routing every test dispatch through the TPU tunnel
# (minutes -> hours). Force the config itself back to cpu-only before
# any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite's cost is dominated by CPU jit
# compiles of per-curve ladder/Straus kernels; libecc_tpu.__init__ enables
# the cache via jax.config.update (the JAX_COMPILATION_CACHE_DIR env var
# is ignored by this JAX build). Default dir: ~/.cache/libecc_tpu_jax;
# override with LIBECC_TPU_JAX_CACHE.

import random

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Test tiers (the analog of the reference's quick self-tests vs the full
# CI matrix, .github/workflows/libecc_runtime_tests.yml):
#   default ("smoke"): skips @pytest.mark.slow — arithmetic + one curve
#       per scheme + parity samples; target < 5 min cold on CPU.
#   nightly: LIBECC_TPU_FULL=1 runs everything (full KAT matrix, all
#       curves, fuzz at full count, multi-process), plus the config
#       matrix via scripts/run_config_matrix.sh.
# ---------------------------------------------------------------------------

_FULL = os.environ.get("LIBECC_TPU_FULL", "0") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: nightly-tier test (runs when LIBECC_TPU_FULL=1 "
        "or explicitly selected with -m slow)")


def pytest_collection_modifyitems(config, items):
    if _FULL or config.getoption("-m", default=""):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set LIBECC_TPU_FULL=1 (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    r = random.Random(0xECC)
    return r
