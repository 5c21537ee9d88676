"""Optimizer + LR schedule construction from mmdet-style configs.

Reference contract (SURVEY.md §2.2 "Runner/optim"): ``optimizer = dict(
type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)`` with torch SGD
semantics (weight decay added to the gradient BEFORE the momentum buffer),
``optimizer_config = dict(grad_clip=...)``, and ``lr_config`` step policy
with linear warmup (reference
configs/OA-DG/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py:36-42).

Freezing (``frozen_stages``, ``norm_cfg.requires_grad=False``) is expressed
as an optax mask that zeroes those gradients — the forward graph stays
static (no module surgery), the reference-equivalent of param.requires_grad.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def frozen_mask(params, model_cfg: dict) -> Any:
    """Pytree of bools: True where the param must NOT be updated.

    Mirrors reference ResNet._freeze_stages (mmdet resnet.py) +
    norm requires_grad=False: stem and stages 1..frozen_stages of the
    backbone, and all backbone norm affine params when the backbone's
    norm_cfg sets requires_grad=False.
    """
    bb = dict(model_cfg.get("backbone", {}))
    frozen_stages = int(bb.get("frozen_stages", -1))
    norm_cfg = dict(bb.get("norm_cfg") or {})
    freeze_norm = norm_cfg.get("requires_grad", True) is False

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_frozen(path) -> bool:
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        if "backbone" not in joined:
            return False
        if freeze_norm and any("FrozenBN" in k for k in keys):
            # caffe-style: all backbone BN affine params frozen
            return True
        # Stem / stage rules must match only the DIRECT child of the
        # backbone module: residual blocks name their inner convs
        # conv1/conv2/conv3 too, and an any()-over-the-path match froze
        # the first conv of EVERY block (caught by
        # tests/test_optim_schedules.py::test_frozen_mask...).
        bb_idx = next(i for i, k in enumerate(keys) if "backbone" in k)
        sub = keys[bb_idx + 1] if len(keys) > bb_idx + 1 else ""
        if frozen_stages >= 0 and sub.startswith(("conv1", "stem_conv")):
            return True
        # frozen stem norm lives next to conv1 as FrozenBN_0
        if frozen_stages >= 0 and sub == "FrozenBN_0":
            return True
        for s in range(1, frozen_stages + 1):
            if sub.startswith(f"layer{s}_"):
                return True
        return False

    return jax.tree_util.tree_map_with_path(lambda p, _: is_frozen(p), params)


def build_lr_schedule(lr_config: dict, base_lr: float,
                      steps_per_epoch: int) -> Callable:
    """mmdet LrUpdaterHook -> optax schedule (iteration-indexed)."""
    cfg = dict(lr_config or {})
    policy = cfg.get("policy", "step").lower()
    warmup = cfg.get("warmup")
    warmup_iters = int(cfg.get("warmup_iters", 0))
    warmup_ratio = float(cfg.get("warmup_ratio", 0.1))

    if policy == "step":
        steps = cfg.get("step", [])
        steps = steps if isinstance(steps, (list, tuple)) else [steps]
        gamma = float(cfg.get("gamma", 0.1))
        boundaries = [int(s * steps_per_epoch) for s in steps]

        def base(t):
            mult = 1.0
            for b in boundaries:
                mult = jnp.where(t >= b, mult * gamma, mult)
            return base_lr * mult
    elif policy == "cosineannealing":
        min_ratio = float(cfg.get("min_lr_ratio", 0.0))
        total = cfg.get("max_iters")

        def base(t):
            frac = jnp.clip(t / max(total or 1, 1), 0, 1)
            return base_lr * (min_ratio + (1 - min_ratio)
                              * 0.5 * (1 + jnp.cos(jnp.pi * frac)))
    elif policy == "yolox":
        # reference core/hook/yolox_lrupdater_hook.py: quadratic warmup
        # from 0, cosine anneal to min_lr_ratio, FLAT at min_lr for the
        # final num_last_epochs epochs.
        min_ratio = float(cfg.get("min_lr_ratio", 0.05))
        last_ep = int(cfg.get("num_last_epochs", 15))
        total_ep = int(cfg.get("total_epochs", cfg.get("max_epochs", 300)))
        total = (total_ep - last_ep) * steps_per_epoch
        wi = max(warmup_iters, 1)

        def base(t):
            frac = jnp.clip((t - wi) / max(total - wi, 1), 0, 1)
            cos = base_lr * (min_ratio + (1 - min_ratio)
                             * 0.5 * (1 + jnp.cos(jnp.pi * frac)))
            return jnp.where(t >= total, base_lr * min_ratio, cos)

        def schedule(t):
            # quadratic warmup from 0 (not the generic linear warmup)
            wf = jnp.clip(t / wi, 0.0, 1.0) ** 2
            return jnp.where(t < wi, base_lr * wf, base(t))

        return schedule
    else:
        def base(t):
            return jnp.asarray(base_lr)

    def schedule(t):
        lr = base(t)
        if warmup == "linear" and warmup_iters > 0:
            k = jnp.clip(t / warmup_iters, 0.0, 1.0)
            wf = warmup_ratio + (1.0 - warmup_ratio) * k
            lr = lr * jnp.where(t < warmup_iters, wf, 1.0)
        elif warmup == "constant" and warmup_iters > 0:
            lr = lr * jnp.where(t < warmup_iters, warmup_ratio, 1.0)
        elif warmup == "exp" and warmup_iters > 0:
            k = jnp.clip(t / warmup_iters, 0.0, 1.0)
            lr = lr * jnp.where(t < warmup_iters, warmup_ratio ** (1 - k), 1.0)
        return lr

    return schedule


def build_optimizer(params, optimizer_cfg: dict, lr_schedule: Callable,
                    model_cfg: Optional[dict] = None,
                    grad_clip: Optional[dict] = None) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg or dict(type="SGD", lr=0.02, momentum=0.9,
                                     weight_decay=1e-4))
    opt_type = cfg.get("type", "SGD")
    wd = float(cfg.get("weight_decay", 0.0))
    chain = []
    if model_cfg is not None:
        mask = frozen_mask(params, model_cfg)
        chain.append(optax.masked(optax.set_to_zero(), mask))
    if grad_clip:
        max_norm = float(dict(grad_clip).get("max_norm", 35))
        chain.append(optax.clip_by_global_norm(max_norm))
    if opt_type == "SGD":
        momentum = float(cfg.get("momentum", 0.9))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=bool(cfg.get("nesterov", False))))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
    elif opt_type in ("Adam", "AdamW"):
        chain.append(optax.scale_by_adam(b1=cfg.get("betas", (0.9, 0.999))[0],
                                         b2=cfg.get("betas", (0.9, 0.999))[1]))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
    else:
        raise NotImplementedError(opt_type)
    return optax.chain(*chain)
