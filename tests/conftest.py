"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on a single real TPU chip; tests validate multi-device
sharding semantics on CPU via XLA's host-platform device-count flag (set
before jax initializes).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
