"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "multi-chip without a cluster" trick (SURVEY.md §4):
tests exercise the same sharding/collective code paths the TPU pod would run.
Must set flags before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env pre-sets the TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize may have imported jax already (before this conftest), in which
# case the env var alone is too late — update the config directly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run tests marked slow (multi-minute single-core jobs)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (needs --run-slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow: pass --run-slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
