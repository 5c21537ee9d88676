"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on a single real TPU chip; tests validate multi-device
sharding semantics on CPU via XLA's host-platform device-count flag.

Note: the session's sitecustomize imports jax with JAX_PLATFORMS=axon (TPU
tunnel) before conftest runs, so the env var alone is latched — we override
through jax.config, which takes effect because backends initialize lazily.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
