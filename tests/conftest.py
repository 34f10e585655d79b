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
    config.addinivalue_line(
        "markers",
        "heavy: virtual-mesh / whole-experiment tests dominated by XLA "
        "compiles (minutes each on CPU); deselect with -m 'not heavy' "
        "for a quick pass — scripts/run/tests.sh wraps both modes",
    )


# Modules whose tests jit whole train/eval programs (often over the virtual
# 8-device mesh) — the compile-time heavyweights of the suite. Tagged
# centrally so `-m "not heavy"` gives a fast inner-loop pass without
# per-file marker drift.
_HEAVY_MODULES = {
    "test_cli_evaluate",
    "test_distributed",
    "test_distributed_train_step",
    "test_e2e",
    "test_ingest_e2e",
    "test_parity_fullscale",
    "test_train_step",
    "test_torch_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow: pass --run-slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
