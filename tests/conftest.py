"""Test configuration: force an 8-device virtual CPU mesh before jax import.

The real TPU chip is reserved for bench runs; unit tests run on CPU with 8
virtual devices so sharding/pjit paths are exercised without hardware.
"""

import os

# Hard-set: the sandbox pre-sets JAX_PLATFORMS=axon (remote TPU tunnel), which
# would make eager unit tests dispatch every op over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# This build's CPU backend defaults to bf16-grade matmul passes (~7e-2 error
# on unit-normal 64x64 matmuls); unit tests check math, so force fp32.
# (The env var is not picked up by this jax build, so set the config flag.)
import jax  # noqa: E402

# The sandbox's sitecustomize registers the axon (remote TPU) PJRT plugin at
# interpreter start, BEFORE this file runs — with it registered, the
# JAX_PLATFORMS env above is ignored and "CPU" tests silently dispatch every
# op over the TPU tunnel. The config API wins over the pre-registered plugin
# as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the TPU tunnel")
assert len(jax.devices()) == 8

jax.config.update("jax_default_matmul_precision", "highest")
