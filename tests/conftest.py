"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/mesh tests need multiple devices; the standard JAX trick is
``xla_force_host_platform_device_count`` (SURVEY §4).  Must be set before
jax initialises, hence here at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The environment's sitecustomize force-selects the TPU ("axon") platform via
# jax.config, overriding JAX_PLATFORMS env — override it back for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
