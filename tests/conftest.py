"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
host platform to expose 8 devices; the real-TPU path is exercised by bench.py.

Note: this image's JAX build force-registers the 'axon' TPU-tunnel platform
(config value 'axon,cpu' regardless of JAX_PLATFORMS), so we must override via
jax.config.update before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
