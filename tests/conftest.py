"""Test harness configuration.

Tests run on a forced 8-device CPU mesh — the TPU answer to "test multi-chip
without a pod" (SURVEY.md §4): sharding tests exercise real `Mesh` /
`shard_map` partitioning on virtual host devices, and everything is
deterministic and fast.  These env vars must be set before jax is imported
anywhere, hence this top-of-conftest placement.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (a tunneled TPU
# chip); unit tests must run on local virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
