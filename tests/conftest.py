"""Test configuration: run on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes its backends, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon): the suite runs on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The env var alone is not enough when a TPU PJRT plugin is pre-registered
# (this image registers 'axon' at interpreter startup); the config update
# below reliably selects CPU as long as no backend has been touched yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
