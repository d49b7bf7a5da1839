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

# The env vars above only work if jax has not been touched yet.  A
# sitecustomize hook in this image imports jax and *initializes* the
# tunneled-TPU backend at interpreter startup, which pins the platform
# before conftest runs; in that case tear the backends down and rebuild on
# 8 virtual CPU devices.
import jax  # noqa: E402

if jax.default_backend() != "cpu" or jax.device_count() < 8:
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()
        jax.config.update("jax_num_cpu_devices", 8)
        jax.clear_caches()
    except Exception as e:  # pragma: no cover - depends on jax internals
        raise RuntimeError(
            "tests need 8 virtual CPU devices but a non-CPU jax backend "
            f"was already initialized and could not be reset: {e}"
        ) from e
assert jax.default_backend() == "cpu" and jax.device_count() >= 8, (
    jax.devices()
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
