"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 test plan).

Note: this environment registers a remote-TPU PJRT plugin via sitecustomize
and pins ``jax_platforms`` to it, so the override must go through
`jax.config` *after* importing jax — env vars alone are ignored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the d+2-key lexsort graphs are the suite's
# compile-time long pole (docs/ROADMAP.md) — cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy whole-model test (excluded from the "
        "fast iteration subset)")
    config.addinivalue_line(
        "markers", "fast: auto-applied to every test not marked slow — "
        "`pytest -m fast` is the <5 min iteration subset; the full suite "
        "remains the gate")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
