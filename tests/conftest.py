"""Test configuration: force an 8-device virtual CPU mesh before jax import.

The real TPU chip is reserved for bench runs; unit tests run on CPU with 8
virtual devices so sharding/pjit paths are exercised without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
