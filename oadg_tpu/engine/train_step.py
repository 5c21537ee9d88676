"""The jitted train step: loss -> grad -> optimizer, sharded over the mesh.

Replaces the reference's per-iteration path ``BaseDetector.train_step`` +
mmcv ``OptimizerHook`` + DDP allreduce (reference
mmdet/models/detectors/base.py:413-455, apis/train.py:113-121). One XLA
program does forward, backward, gradient all-reduce (implicit, over the
mesh's ``data`` axis) and the SGD update; log scalars come back replicated
(the reference all-reduces log_vars explicitly in ``_parse_losses``; with a
sharded jit they are already globally consistent).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, replicated


def parse_losses(losses: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    """Sum every entry whose key contains 'loss' (reference base.py
    _parse_losses — cascade heads emit 's0.loss_cls'-style keys)."""
    total = sum(v for k, v in losses.items() if "loss" in k)
    log_vars = dict(losses)
    log_vars["loss"] = total
    return total, log_vars


def make_train_step(detector, tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True,
                    preprocess: Optional[Callable] = None) -> Callable:
    """Build the jitted (params, batch_stats, opt_state, batch, rng, step) ->
    (params, opt_state, log_vars) function.

    ``preprocess`` (batch, key) -> batch runs INSIDE the jitted step —
    on-device OA-Mix + multi-view integration fuse with the forward pass
    (engine/preprocess.py).
    """

    def step(params, batch_stats, opt_state, batch, rng):
        if preprocess is not None:
            rng, pk = jax.random.split(rng)
            batch = preprocess(batch, pk)

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            # mutable batch_stats puts live-BN layers (norm_eval=False —
            # YOLOv3 neck/head, CSPDarknet/YOLOX, SyncBN configs) in train
            # mode; their moving-stat updates come back as aux state. Under
            # a mesh the batch-stat reductions run over the global sharded
            # batch, i.e. SyncBN (reference mmcv SyncBatchNorm).
            losses, new_vars = detector.apply(variables, batch, "train",
                                              rngs={"sampling": rng},
                                              mutable=["batch_stats"])
            total, log_vars = parse_losses(losses)
            new_stats = (new_vars["batch_stats"]
                         if new_vars.get("batch_stats") else batch_stats)
            return total, (log_vars, new_stats)

        ((_, (log_vars, batch_stats)), grads) = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, log_vars

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, bsh, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def make_aug_test_step(detector, metas) -> Callable:
    """Jitted TTA step. ``metas`` — the static per-view (flip,
    flip_direction) tuple from MultiScaleFlipAug — is closed over, so each
    distinct TTA configuration compiles once; per-view image shapes are
    part of the jit signature as usual."""
    metas = tuple((bool(f), str(d)) for f, d in metas)

    @jax.jit
    def step(params, batch_stats, views):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return detector.apply(variables, (tuple(views), metas), "aug_test")

    return step


def make_test_step(detector, mesh=None) -> Callable:
    def step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return detector.apply(variables, batch, "test")

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, rep, bsh), out_shardings=bsh)
