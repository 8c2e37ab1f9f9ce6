"""Test configuration: run JAX on the CPU backend with 8 virtual devices.

Sharding / multi-chip tests use a virtual device mesh
(--xla_force_host_platform_device_count=8), the standard way to validate
pjit/shard_map layouts without TPU pod hardware.

Note: the environment's sitecustomize pre-imports jax and registers the
'axon' TPU platform, so JAX_PLATFORMS env tweaks are too late — we must
override through jax.config before any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
