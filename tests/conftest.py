"""Test configuration: force a simulated 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are validated on
a virtual CPU mesh (the TPU-native analogue of multi-node testing without a
cluster). Must run before jax initializes its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A site-level TPU plugin (if present) may have already forced
# jax_platforms via jax.config at interpreter start — override it too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
