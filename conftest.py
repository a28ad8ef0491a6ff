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
