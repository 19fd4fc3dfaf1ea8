"""Test harness config: force an 8-device virtual CPU platform.

Tests must run identically with or without TPU hardware attached; sharding
tests use the 8 virtual devices.  The config must be applied before any jax
backend initialization, hence here at conftest import time.
"""

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
