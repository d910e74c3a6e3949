"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
is exercised without TPU hardware (the driver's dryrun does the same).  Must
be set before jax is first imported.
"""

import os
import sys

# force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), which
# must never be used for tests — first-compile latency there is minutes
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from dvda_tpu.testutil import oracle  # noqa: E402


@pytest.fixture(scope="session")
def ref_oracle():
    """The reference dvda2wav binary, built on demand; skips if unbuildable."""
    if not oracle.ensure_built():
        pytest.skip("reference oracle could not be built")
    return oracle
