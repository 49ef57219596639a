"""Test config: hermetic 8-virtual-device CPU JAX.

Tests run on CPU with 8 virtual devices so sharding/multi-chip paths are
exercised without TPU hardware (per driver guidance). bench.py and
__graft_entry__.py use the real chip.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
var, so we must force the platform through jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by XLA compiles of
# the same programs across processes/runs (keyed by HLO hash — safe)
jax.config.update("jax_compilation_cache_dir", "/tmp/plslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: each test gets the SAME deterministic stream
    # regardless of suite order (a shared session stream made tests
    # order-dependent and flaky near tolerance boundaries)
    return np.random.default_rng(42)
