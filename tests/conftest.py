"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Entropy/T2/host paths don't need a TPU; jnp transforms run fine on CPU; the
multi-chip sharding tests need 8 virtual devices
(xla_force_host_platform_device_count, the JAX analog of a fake backend).
Must set env before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
