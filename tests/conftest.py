"""Test configuration: force an 8-device virtual CPU platform so sharding/mesh tests run
anywhere (SURVEY.md §7 step 10) and numerics are fp32-exact (no TPU bf16 matmuls).

The environment pins JAX_PLATFORMS=axon via sitecustomize, so the env-var route is not
enough — we must override through jax.config before any backend is initialized.
"""

import os
import sys

# Must be set before the CPU backend initializes for the 8-device virtual mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
