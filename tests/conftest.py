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

# keep the persistent compilation cache inside the repo for test runs
# (XLA programs are deterministic in the geometry, so repeat suite runs
# skip their first-compiles); tests that set DVDA_TPU_* decode knobs
# never touch this one
os.environ.setdefault(
    "DVDA_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jaxcache"))

# The container's sitecustomize imports jax at interpreter start and forces
# jax_platforms="axon,cpu" via jax.config — env vars alone are then a no-op.
# Backends initialise lazily, so overriding the config before the first
# jax.devices() call still wins.
if "jax" in sys.modules:
    import jax

    if not hasattr(jax._src.xla_bridge, "_backends"):
        # the private attribute moved in this JAX release: fall back to
        # forcing CPU and verifying it took, rather than silently guessing
        # (advisor r2) — jax.config.update raises if backends are live
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            raise RuntimeError(
                "could not force the CPU backend (jax._src.xla_bridge."
                "_backends is gone and a non-CPU backend is live)")
    elif not jax._src.xla_bridge._backends:
        jax.config.update("jax_platforms", "cpu")
    elif jax.default_backend() != "cpu":  # backends already up on axon
        raise RuntimeError(
            "jax initialised on a non-CPU backend before conftest ran; "
            "run pytest with PYTHONPATH= to bypass sitecustomize")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from dvda_tpu.testutil import oracle  # noqa: E402


@pytest.fixture(scope="session")
def ref_oracle():
    """The reference dvda2wav binary, built on demand; skips if unbuildable."""
    if not oracle.ensure_built():
        pytest.skip("reference oracle could not be built")
    return oracle
