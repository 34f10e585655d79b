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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
