"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Entropy/T2/host paths don't need a TPU; jnp transforms run fine on CPU; the
multi-chip sharding tests need 8 virtual devices
(xla_force_host_platform_device_count, the JAX analog of a fake backend).

The ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize imports jax before conftest runs, so plain env mutation is too
late — use jax.config.update, which works as long as no backend has been
initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
