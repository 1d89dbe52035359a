"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Set before any jax import so XLA carves the host into 8 devices — this is how
multi-chip sharding is validated without TPU hardware (SURVEY.md §4).
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU tunnel
# (JAX_PLATFORMS=axon): unit tests must be hermetic and fast.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon before we run; the config
# knob still wins at first-backend-use time.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
