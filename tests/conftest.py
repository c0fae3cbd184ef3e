"""Test environment: force CPU JAX with 8 virtual devices.

SURVEY.md §4/§7: the real TPU (experimental `axon` platform) has a very slow
first init, and multi-device logic must be testable without a pod slice. All
tests therefore run on a forced 8-device CPU mesh; TPU-only tests are marked
``tpu`` and skipped unless GA_TPU_TESTS=1.

This must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This environment force-registers the experimental `axon` TPU platform in
# jax.config at import time, overriding JAX_PLATFORMS; pin the config back
# to CPU unless TPU tests were explicitly requested.
import jax  # noqa: E402

if os.environ.get("GA_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GA_TPU_TESTS") == "1":
        return
    skip_tpu = pytest.mark.skip(reason="TPU tests disabled (set GA_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires the real TPU chip")
    config.addinivalue_line("markers", "slow: long-running acceptance test")
