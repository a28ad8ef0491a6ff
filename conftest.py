"""Root pytest config: force a virtual 8-device CPU mesh before JAX initializes.

Tests run on CPU (set ``APDA_TEST_PLATFORM=tpu`` to override) with 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware.
float64 is enabled so the oracle-parity tests can also run the pipeline in
exact mode.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("APDA_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image force-registers an "axon,cpu" platform priority list that ignores
# the env var, so pin the platform explicitly after import as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_accumulation():
    """Free compiled executables between test modules.

    Full-suite runs (~570 tests in one process) deterministically SIGSEGV
    inside XLA:CPU's backend_compile_and_load at a late big compile
    (tests/test_two_tier.py), while every <=75% subset passes and the same
    compile succeeds solo - an upstream jaxlib 0.9.0 codegen crash triggered
    only by a process's accumulated compiled-program state (not stack size:
    reproduced unchanged under ulimit -s 512MB; not RSS: ~128 GB free; not
    compile COUNT: 600 synthetic distinct compiles + the same big program
    pass - docs/ROUND3.md "Suite-scale native crash").  Dropping cached
    executables at module boundaries keeps the live-program set far below
    the crash threshold at the cost of cross-module recompiles.
    """
    yield
    import jax

    jax.clear_caches()
