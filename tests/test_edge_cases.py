"""Edge cases in the reference's house style (tests/test_models/test_forward
"no-gt" paths): zero valid ground truths, single gt, degenerate boxes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.models import build_detector
from tests.test_forward import BASE_MODEL, TEST_CFG, TRAIN_CFG, _batch


@pytest.fixture(scope="module")
def det_vars():
    det = build_detector(BASE_MODEL, TRAIN_CFG, TEST_CFG)
    batch = _batch()
    variables = jax.jit(lambda r, b: det.init(r, b, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    return det, variables


def test_forward_train_no_gt(det_vars):
    det, variables = det_vars
    batch = _batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(5)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_forward_train_no_gt_grads_finite(det_vars):
    det, variables = det_vars
    batch = _batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])

    def total(p):
        losses = det.apply({**variables, "params": p}, batch, "train",
                           rngs={"sampling": jax.random.PRNGKey(6)})
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    g = jax.grad(total)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_forward_train_single_gt(det_vars):
    det, variables = det_vars
    batch = _batch()
    gv = np.zeros(batch["gt_valid"].shape, bool)
    gv[:, 0] = True
    batch["gt_valid"] = jnp.asarray(gv)
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(7)})
    assert np.isfinite(float(losses["loss_cls"]))


def test_forward_train_degenerate_boxes(det_vars):
    det, variables = det_vars
    batch = _batch()
    gt = np.asarray(batch["gt_bboxes"]).copy()
    gt[:, 0] = [5.0, 5.0, 5.0, 5.0]          # zero-area box
    batch["gt_bboxes"] = jnp.asarray(gt)
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(8)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_oamix_no_gt():
    from oadg_tpu.ops.oamix_device import oamix_batch
    rng = np.random.RandomState(0)
    b, h, w = 1, 64, 96
    img = jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32))
    gt = jnp.zeros((b, 4, 4))
    gtv = jnp.zeros((b, 4), bool)
    cfg = dict(version="augmix", num_views=2, severity=10, mixture_width=3,
               spatial_ratio=4, sigma_ratio=0.3)
    out = oamix_batch(img, gt, gtv, jnp.asarray([[h, w]], jnp.float32),
                      jax.random.PRNGKey(0), cfg)
    aug = np.asarray(out["aug"])
    assert np.isfinite(aug).all() and 0 <= aug.min() and aug.max() <= 255


def test_parse_losses_includes_cascade_stage_keys():
    from oadg_tpu.engine.train_step import parse_losses
    total, log_vars = parse_losses({
        "s0.loss_cls": jnp.asarray(1.0), "s1.loss_bbox": jnp.asarray(2.0),
        "loss_rpn_cls": jnp.asarray(3.0), "acc": jnp.asarray(99.0)})
    assert float(total) == 6.0
    assert float(log_vars["loss"]) == 6.0
