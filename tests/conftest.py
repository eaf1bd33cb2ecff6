"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the multi-host testing recipe from SURVEY.md §4: sharding/collective
code is validated against `--xla_force_host_platform_device_count=8` fake
devices so no TPU pod is needed for CI.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Force CPU: the unit suite must not grab the (single, shared) TPU chip. A
# site hook may have pre-registered the TPU PJRT plugin before conftest runs,
# so the env var alone is not enough — override via jax.config as well.
# Set GNNEP_TEST_TPU=1 to run the suite on real hardware instead.
if not os.environ.get("GNNEP_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
