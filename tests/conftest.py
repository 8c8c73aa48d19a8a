"""Test configuration: force CPU backend with a virtual 8-device mesh, x64 on.

The test environment pre-imports jax with a tunneled TPU backend (high per-call
latency), so we must switch platforms via ``jax.config`` — env vars alone are
read too early.  Mirrors the reference's tolerance-based unit-test strategy
(SURVEY.md §4) on a CPU fake of the TPU mesh
(``xla_force_host_platform_device_count=8``) so sharding paths are exercised
without hardware.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Keep the axon (tunneled-TPU) PJRT plugin out of CPU test processes: its
# sitecustomize registration dials the relay on first backend init (~60 s per
# process).  Clearing the gate here also propagates to pytest-xdist workers,
# which inherit this environment when they spawn.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute XLA compiles)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile; excluded from the default run "
        "(enable with --runslow; run at least once per round)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (compile-heavy): use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
