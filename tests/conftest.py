"""Test harness config: force an 8-device virtual CPU platform.

Tests must run identically with or without TPU hardware attached; sharding
tests use the 8 virtual devices.  The config must be applied before any jax
backend initialization, hence here at conftest import time.
"""

import os

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

# Default the general suite to the host entropy path (fast compiles);
# test_device_entropy.py flips this per-test to cover the device path's
# byte parity explicitly.
os.environ.setdefault("TPUENC_DEVICE_ENTROPY", "0")
