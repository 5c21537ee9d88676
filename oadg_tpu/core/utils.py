"""Distributed utility parity (reference mmdet/core/utils/dist_utils.py).

On a jax mesh these are thin wrappers: gradients are all-reduced by XLA
inside the jitted step (no explicit coalesced allreduce is needed), and
cross-device scalar reduction is a ``pmean`` / device_get.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def get_dist_info():
    """(rank, world_size) — one jax process drives the whole mesh."""
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def reduce_mean(tensor):
    """Mean across data-parallel replicas (reference dist_utils.py:67).
    Inside pjit the value is already globally consistent; outside, this is
    an identity on a single process."""
    return jnp.asarray(tensor)


def allreduce_grads(grads, coalesce: bool = True, bucket_size_mb: int = -1):
    """No-op: XLA inserts gradient all-reduce over the mesh's data axis
    (reference dist_utils.py:14-56 built bucketed NCCL allreduce)."""
    return grads


def all_reduce_dict(py_dict: Dict, op: str = "mean", to_float: bool = True):
    """Reference dist_utils.py:97 — values are already mesh-consistent."""
    return {k: (float(v) if to_float else v) for k, v in py_dict.items()}
