"""YOLOX family + Res2Net (reference mmdet/models/backbones/csp_darknet.py,
res2net.py, necks/yolox_pafpn.py, dense_heads/yolox_head.py,
core/bbox/assigners/sim_ota_assigner.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_res2net_shapes():
    from oadg_tpu.models.backbones.resnet import Res2Net
    m = Res2Net(depth=50, base_channels=16, stem_channels=16,
                out_indices=(0, 3), scales=4, base_width=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert outs[0].shape == (1, 16, 16, 64)
    assert outs[1].shape == (1, 2, 2, 512)


def test_csp_darknet_shapes():
    from oadg_tpu.models.backbones.csp_darknet import CSPDarknet
    m = CSPDarknet(widen_factor=0.25, deepen_factor=0.33)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    # out_indices (2,3,4): strides 8,16,32 with widen 0.25
    assert [o.shape[1] for o in outs] == [16, 8, 4]
    assert [o.shape[-1] for o in outs] == [64, 128, 256]


def test_simota_assign_basic():
    from oadg_tpu.models.dense_heads.yolox_head import simota_assign
    # 6 points, 2 gts; costs make pts 0,1 best for gt0; 3,4 for gt1
    cost = jnp.asarray([
        [0.1, 5.0], [0.2, 5.0], [3.0, 3.0],
        [5.0, 0.1], [5.0, 0.2], [4.0, 4.0]])
    ious = jnp.asarray([
        [0.9, 0.0], [0.8, 0.0], [0.1, 0.1],
        [0.0, 0.9], [0.0, 0.8], [0.1, 0.1]])
    valid = jnp.ones((6, 2), bool)
    a = np.asarray(simota_assign(cost, ious, valid, jnp.asarray([True, True])))
    # dynamic_k = clip(int(sum top10 ious)) = 1 per gt -> best cost point each
    assert a[0] == 1 and a[3] == 2
    assert (a > 0).sum() == 2


def test_simota_conflict_resolution():
    from oadg_tpu.models.dense_heads.yolox_head import simota_assign
    # single point is best for both gts -> keeps min-cost gt (gt1)
    cost = jnp.asarray([[0.5, 0.1], [9.0, 9.0]])
    ious = jnp.asarray([[0.9, 0.95], [0.0, 0.0]])
    valid = jnp.asarray([[True, True], [True, True]])
    a = np.asarray(simota_assign(cost, ious, valid,
                                 jnp.asarray([True, True])))
    assert a[0] == 2


def _yolox_model():
    return dict(
        type="YOLOX",
        backbone=dict(type="CSPDarknet", widen_factor=0.125,
                      deepen_factor=0.33),
        neck=dict(type="YOLOXPAFPN", in_channels=[32, 64, 128],
                  out_channels=32, num_csp_blocks=1),
        bbox_head=dict(type="YOLOXHead", num_classes=3, in_channels=32,
                       feat_channels=32, stacked_convs=1))


def test_yolox_train_and_test():
    from oadg_tpu.models import build_detector
    det = build_detector(_yolox_model(), None,
                         dict(score_thr=0.01, nms=dict(iou_threshold=0.65),
                              max_per_img=10))
    rng = np.random.RandomState(0)
    b, h, w = 2, 128, 128
    batch = {
        "img": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "img_shape": jnp.asarray([[h, w]] * b, jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack([[[16, 16, 64, 64], [70, 30, 120, 100]]] * b)
            .astype(np.float32)),
        "gt_labels": jnp.asarray(np.stack([[0, 2]] * b)),
        "gt_valid": jnp.ones((b, 2), bool),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }
    variables = jax.jit(lambda r, bt: det.init(r, bt, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ("loss_obj", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    assert float(losses["loss_bbox"]) > 0
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 10, 5)


def test_yolox_grads_finite():
    from oadg_tpu.models import build_detector
    det = build_detector(_yolox_model(), None, None)
    rng = np.random.RandomState(1)
    batch = {
        "img": jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
        "img_shape": jnp.asarray([[64, 64]], jnp.float32),
        "gt_bboxes": jnp.asarray([[[8, 8, 40, 40]]], jnp.float32),
        "gt_labels": jnp.asarray([[1]]),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    variables = jax.jit(lambda r, bt: det.init(r, bt, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)

    def total(p):
        losses = det.apply({**variables, "params": p}, batch, "train",
                           rngs={"sampling": jax.random.PRNGKey(3)})
        return sum(losses.values())

    g = jax.grad(total)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_gfl_train_and_test():
    from oadg_tpu.models import build_detector
    model = dict(
        type="GFL",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), norm_cfg=dict(type="BN"),
                      base_channels=16),
        neck=dict(type="FPN", in_channels=[16, 32, 64, 128], out_channels=32,
                  num_outs=5, start_level=1, add_extra_convs="on_output"),
        bbox_head=dict(type="GFLHead", num_classes=3, in_channels=32,
                       feat_channels=32, stacked_convs=1, reg_max=8,
                       anchor_generator=dict(
                           octave_base_scale=8, scales_per_octave=1,
                           ratios=[1.0], strides=[8, 16, 32, 64, 128])))
    det = build_detector(model, dict(assigner=dict(topk=9)),
                         dict(score_thr=0.05, nms=dict(iou_threshold=0.6),
                              max_per_img=10))
    rng = np.random.RandomState(0)
    b, h, w = 2, 64, 96
    batch = {
        "img": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "img_shape": jnp.asarray([[h, w]] * b, jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack([[[8, 8, 40, 40], [50, 20, 80, 56]]] * b)
            .astype(np.float32)),
        "gt_labels": jnp.asarray(np.stack([[0, 2]] * b)),
        "gt_valid": jnp.ones((b, 2), bool),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }
    variables = jax.jit(lambda r, bt: det.init(r, bt, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ("loss_cls", "loss_bbox", "loss_dfl"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["loss_dfl"]) > 0
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 10, 5)


def test_bfp_hrfpn_dilated_encoder():
    from oadg_tpu.models.necks.extra_necks import (BFP, DilatedEncoder,
                                                   HRFPN)
    feats = tuple(jnp.zeros((1, 32 // (2 ** i), 48 // (2 ** i), 16))
                  for i in range(5))
    bfp = BFP(in_channels=16, num_levels=5, refine_level=2)
    v = jax.jit(bfp.init)(jax.random.PRNGKey(0), feats)
    outs = bfp.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]

    hr_in = tuple(jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), 8 * (i + 1)))
                  for i in range(4))
    hr = HRFPN(in_channels=(8, 16, 24, 32), out_channels=16, num_outs=5)
    v = jax.jit(hr.init)(jax.random.PRNGKey(0), hr_in)
    outs = hr.apply(v, hr_in)
    assert len(outs) == 5 and outs[0].shape == (1, 32, 32, 16)
    assert outs[4].shape == (1, 2, 2, 16)

    de = DilatedEncoder(in_channels=32, out_channels=16,
                        block_mid_channels=8)
    v = jax.jit(de.init)(jax.random.PRNGKey(0), (jnp.zeros((1, 8, 8, 32)),))
    (out,) = de.apply(v, (jnp.zeros((1, 8, 8, 32)),))
    assert out.shape == (1, 8, 8, 16)
