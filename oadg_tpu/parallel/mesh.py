"""Device mesh + sharding helpers (replaces the reference's NCCL DDP layer).

The reference's only multi-device strategy is data parallelism via
``MMDistributedDataParallel`` + NCCL allreduce (SURVEY.md §2.3,
reference mmdet/apis/train.py:113-121, tools/dist_train.sh). TPU-natively
that whole layer disappears: the train step is jitted over a
``jax.sharding.Mesh`` with the batch sharded on the ``data`` axis and params
replicated; XLA inserts the gradient all-reduce over ICI. Multi-host
extends the same mesh over processes (``jax.distributed.initialize``).

A ``model`` axis is part of the mesh shape for forward-compatible tensor
sharding (unused = size 1 in the OA-DG configs, which fit per-chip).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data or (len(devices) // n_model)
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
