"""LR schedules + SGD semantics vs the reference recipes
(mmcv LrUpdaterHook step policy with linear warmup — flagship config
configs/OA-DG/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py:36-42 —
and torch SGD: weight decay added to the gradient BEFORE momentum)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import optax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oadg_tpu.engine.optim import build_lr_schedule, build_optimizer


def test_step_policy_with_linear_warmup():
    # flagship recipe: warmup 500 iters ratio 0.001, step at epoch 1 of 2
    sched = build_lr_schedule(
        dict(policy="step", warmup="linear", warmup_iters=500,
             warmup_ratio=0.001, step=[1]),
        base_lr=0.01, steps_per_epoch=1000)
    # t=0: lr = base * warmup_ratio (mmcv: ratio + (1-ratio)*t/iters)
    assert float(sched(0)) == pytest.approx(0.01 * 0.001)
    # halfway through warmup
    k = 250 / 500
    assert float(sched(250)) == pytest.approx(
        0.01 * (0.001 + (1 - 0.001) * k))
    # after warmup, before the step boundary
    assert float(sched(999)) == pytest.approx(0.01)
    # after the boundary (epoch 1 * 1000 iters): gamma 0.1
    assert float(sched(1000)) == pytest.approx(0.001)
    assert float(sched(1999)) == pytest.approx(0.001)


def test_cosine_and_constant_warmup():
    sched = build_lr_schedule(
        dict(policy="cosineannealing", min_lr_ratio=0.1, max_iters=100),
        base_lr=1.0, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.1)
    assert float(sched(50)) == pytest.approx(0.1 + 0.9 * 0.5)

    sched2 = build_lr_schedule(
        dict(policy="step", step=[], warmup="constant", warmup_iters=10,
             warmup_ratio=0.5),
        base_lr=1.0, steps_per_epoch=10)
    assert float(sched2(5)) == pytest.approx(0.5)
    assert float(sched2(10)) == pytest.approx(1.0)


def test_sgd_matches_torch_semantics():
    """One step of torch.optim.SGD(lr, momentum, weight_decay) computed by
    hand: g' = g + wd*p; buf = momentum*buf + g'; p -= lr*buf."""
    lr, momentum, wd = 0.1, 0.9, 0.01
    p0, g0 = 2.0, 0.5
    params = {"w": jnp.asarray([p0])}
    tx = build_optimizer(params, dict(type="SGD", lr=lr, momentum=momentum,
                                      weight_decay=wd),
                         lambda t: lr)
    state = tx.init(params)
    grads = {"w": jnp.asarray([g0])}

    # step 1
    up, state = tx.update(grads, state, params)
    params = optax.apply_updates(params, up)
    gp = g0 + wd * p0
    buf = gp
    p1 = p0 - lr * buf
    assert float(params["w"][0]) == pytest.approx(p1, rel=1e-6)

    # step 2 (momentum buffer engaged)
    up, state = tx.update(grads, state, params)
    params = optax.apply_updates(params, up)
    gp2 = g0 + wd * p1
    buf = momentum * buf + gp2
    p2 = p1 - lr * buf
    assert float(params["w"][0]) == pytest.approx(p2, rel=1e-6)


def test_frozen_mask_zeroes_backbone_updates():
    params = {
        "backbone_m": {"conv1": {"Conv_0": {"kernel": jnp.ones((3,))}},
                       "layer1_0": {"conv1": {"Conv_0": {"kernel": jnp.ones((3,))}}},
                       "layer2_0": {"conv1": {"Conv_0": {"kernel": jnp.ones((3,))}}}},
        "rpn": {"Conv_0": {"kernel": jnp.ones((3,))}},
    }
    tx = build_optimizer(params, dict(type="SGD", lr=1.0, momentum=0.0,
                                      weight_decay=0.0),
                         lambda t: 1.0,
                         model_cfg=dict(backbone=dict(frozen_stages=1)))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    up, _ = tx.update(grads, state, params)
    assert float(np.abs(up["backbone_m"]["conv1"]["Conv_0"]["kernel"]).max()) == 0
    assert float(np.abs(up["backbone_m"]["layer1_0"]["conv1"]["Conv_0"]["kernel"]).max()) == 0
    assert float(np.abs(up["backbone_m"]["layer2_0"]["conv1"]["Conv_0"]["kernel"]).max()) > 0
    assert float(np.abs(up["rpn"]["Conv_0"]["kernel"]).max()) > 0


import jax  # noqa: E402  (used in test above)
