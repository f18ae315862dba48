"""Test harness config.

Tests run on the CPU backend with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4: multi-chip testing via XLA host-device
emulation). The axon sitecustomize registers the TPU platform in every
process; we switch the default platform back to CPU *before* any backend
initialization, which must happen at conftest import time.
"""

import os

# Must be set before the CPU client is created.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# RUN_TPU_TESTS=1 leaves the real platform in place for tests/test_tpu.py
# (run ONLY that file with the flag — the rest of the suite expects the
# 8-virtual-device CPU backend).
if not os.environ.get("RUN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA CPU compiles of
# the unrolled integrators; caching makes re-runs fast. (The cache-stall
# caveat in utils/jaxcache.py applies to the axon TPU backend only — the
# suite is pinned to CPU above.)
jax.config.update(
    "jax_compilation_cache_dir", "/tmp/se195_test_jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU_TESTS"):
        return
    skip_tpu = pytest.mark.skip(reason="TPU tests disabled (set RUN_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
