"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated on
host-platform virtual devices instead (the same XLA partitioner runs either
way).  The environment may pre-set JAX_PLATFORMS (e.g. to a TPU tunnel) and
pre-import jax from sitecustomize, so plain env-var defaults are not enough:
override the env *and* the live jax config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


def reference_path(rel: str) -> str:
    """Path inside the read-only reference checkout (for parity tests only).

    Reference data files are *not* vendored into this repo; parity tests that
    need the exact shipped parity-check matrices skip when the checkout is
    absent.
    """
    return os.path.join(REFERENCE_ROOT, rel)


def require_reference(rel: str) -> str:
    p = reference_path(rel)
    if not os.path.exists(p):
        pytest.skip(f"reference data {rel} not available")
    return p


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
