"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (halo-exchange overlap-save) is tested on CPU via
xla_force_host_platform_device_count, per SURVEY.md §4.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The preinstalled TPU plugin ("axon") overrides JAX_PLATFORMS; force CPU
# through the config API, which wins.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
