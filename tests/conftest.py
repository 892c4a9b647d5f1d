"""Test configuration: force a virtual 8-device CPU platform.

This image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon (a
tunneled single real TPU), so env vars alone are too late — we override the
already-imported jax config before any backend initializes. Sharding and
collective tests then run on 8 virtual CPU devices without TPU hardware.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
