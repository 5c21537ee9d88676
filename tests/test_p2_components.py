"""P2 surface: ATSS assigner, OHEM sampler, extra stock losses (reference
mmdet/core/bbox/assigners/atss_assigner.py, samplers/ohem_sampler.py,
models/losses/{balanced_l1_loss,ghm_loss,dice_loss,gfocal_loss}.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.core.bbox.assign_sample import (ATSSAssigner, MaxIoUAssigner,
                                              OHEMSampler)
from oadg_tpu.models.losses.common import (BalancedL1Loss, DiceLoss,
                                           DistributionFocalLoss,
                                           GaussianFocalLoss, GHMC, GHMR,
                                           QualityFocalLoss)


def _grid_anchors(hs, ws, stride, size):
    out = []
    for h, w, s in zip(hs, ws, stride):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        cx = (xs.ravel() + 0.5) * s
        cy = (ys.ravel() + 0.5) * s
        half = size * s / 2
        out.append(np.stack([cx - half, cy - half, cx + half, cy + half], -1))
    return [a.astype(np.float32) for a in out]


def test_atss_assigner_basic():
    levels = _grid_anchors([8, 4], [8, 4], [8, 16], 4.0)
    anchors = jnp.asarray(np.concatenate(levels))
    nlev = [len(l) for l in levels]
    gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]])
    gtv = jnp.asarray([True, False])
    res = ATSSAssigner(topk=9).assign(anchors, nlev, gt, gtv,
                                      gt_labels=jnp.asarray([2, 0]))
    a = np.asarray(res.gt_inds)
    # some positives, all matched to gt 1, labels propagated
    assert (a == 1).sum() > 0 and not (a > 1).any()
    assert set(np.asarray(res.labels)[a == 1]) == {2}
    # positives must have centers inside the gt box
    pos = np.asarray(anchors)[a == 1]
    cx = (pos[:, 0] + pos[:, 2]) / 2
    cy = (pos[:, 1] + pos[:, 3]) / 2
    assert (cx >= 8).all() and (cx <= 40).all()
    assert (cy >= 8).all() and (cy <= 40).all()


def test_atss_assigner_no_gt():
    levels = _grid_anchors([4], [4], [8], 4.0)
    anchors = jnp.asarray(levels[0])
    res = ATSSAssigner().assign(anchors, [16], jnp.zeros((2, 4)),
                                jnp.zeros(2, bool))
    assert not (np.asarray(res.gt_inds) > 0).any()


def test_ohem_sampler_picks_hard_negatives():
    boxes = jnp.asarray(np.random.RandomState(0).rand(64, 4) * 50)
    boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + 10], -1)
    gt = jnp.asarray([[0.0, 0.0, 12.0, 12.0]])
    assign = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5).assign(
        boxes, gt, jnp.asarray([True]), jnp.asarray([1]))
    # hard score = index (so hardest = largest index)
    scores = jnp.arange(64.0)
    s = OHEMSampler(num=16, pos_fraction=0.25).sample(
        jax.random.PRNGKey(0), assign, hard_scores=scores)
    negs = np.asarray(s.inds)[~np.asarray(s.is_pos) & np.asarray(s.valid)]
    all_negs = np.where(np.asarray(assign.gt_inds) == 0)[0]
    # chosen negatives are exactly the top-|negs| hardest available
    want = set(sorted(all_negs, key=lambda i: -i)[:len(negs)])
    assert set(negs.tolist()) == want


def test_ohem_sampler_fallback_random():
    assign_inds = jnp.asarray([0] * 30 + [1, 2])
    from oadg_tpu.core.bbox.assign_sample import AssignResult
    ar = AssignResult(assign_inds, jnp.zeros(32), jnp.full((32,), -1, jnp.int32))
    s = OHEMSampler(num=8, pos_fraction=0.5).sample(jax.random.PRNGKey(1), ar)
    assert int(np.asarray(s.is_pos).sum()) == 2


def test_balanced_l1_matches_l1_asymptote():
    pred = jnp.asarray([10.0])
    tgt = jnp.asarray([0.0])
    l = BalancedL1Loss(alpha=0.5, gamma=1.5, beta=1.0, reduction="none")(pred, tgt)
    # for large diff: gamma*d + C
    assert abs(float(l[0]) - (1.5 * 10 + 1.5 / (np.e ** 3 - 1) - 0.5)) < 1e-4


def test_balanced_l1_zero_at_zero():
    l = BalancedL1Loss(reduction="none")(jnp.zeros(3), jnp.zeros(3))
    assert np.allclose(np.asarray(l), 0.0, atol=1e-6)


def test_ghmc_finite_and_weighted():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(12, 4).astype(np.float32))
    target = jnp.asarray((rng.rand(12, 4) > 0.5).astype(np.float32))
    l = GHMC(bins=5)(pred, target)
    assert np.isfinite(float(l)) and float(l) > 0


def test_ghmr_finite():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    target = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    l = GHMR()(pred, target)
    assert np.isfinite(float(l)) and float(l) > 0


def test_dice_perfect_prediction():
    t = jnp.asarray(np.random.RandomState(2).rand(3, 8, 8) > 0.5).astype(jnp.float32)
    logits = (t * 2 - 1) * 20.0           # sigmoid -> ~0/1
    l = DiceLoss()(logits, t)
    assert float(l) < 0.01


def test_dice_worst_prediction():
    t = jnp.ones((2, 4, 4))
    logits = -20.0 * jnp.ones((2, 4, 4))
    assert float(DiceLoss()(logits, t)) > 0.9


def test_qfl_zero_when_perfect():
    labels = jnp.asarray([0, 2])
    scores = jnp.asarray([1.0, 1.0])
    logits = jnp.full((2, 3), -30.0)
    logits = logits.at[0, 0].set(30.0).at[1, 2].set(30.0)
    l = QualityFocalLoss()(logits, (labels, scores))
    assert float(l) < 1e-3


def test_dfl_brackets_target():
    # target 2.3 -> CE against bins 2 (w 0.7) and 3 (w 0.3)
    logits = jnp.asarray([[0.0, 0.0, 5.0, 5.0, 0.0]])
    label = jnp.asarray([2.3])
    l = DistributionFocalLoss(reduction="none")(logits, label)
    logp = jax.nn.log_softmax(logits, -1)
    want = -0.7 * logp[0, 2] - 0.3 * logp[0, 3]
    assert abs(float(l[0]) - float(want)) < 1e-5


def test_gaussian_focal_low_on_match():
    hm = jnp.zeros((1, 8, 8)).at[0, 4, 4].set(1.0)
    pred = jnp.clip(hm, 1e-4, 1 - 1e-4)
    assert float(GaussianFocalLoss()(pred, hm)) < 0.01


def test_atss_detector_train_and_test():
    from oadg_tpu.models import build_detector
    model = dict(
        type="ATSS",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), norm_cfg=dict(type="BN"),
                      base_channels=16),
        neck=dict(type="FPN", in_channels=[16, 32, 64, 128], out_channels=32,
                  num_outs=5, start_level=1,
                  add_extra_convs="on_output"),
        bbox_head=dict(type="ATSSHead", num_classes=3, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       anchor_generator=dict(
                           octave_base_scale=8, scales_per_octave=1,
                           ratios=[1.0], strides=[8, 16, 32, 64, 128])))
    train_cfg = dict(assigner=dict(type="ATSSAssigner", topk=9))
    test_cfg = dict(nms_pre=100, score_thr=0.05,
                    nms=dict(iou_threshold=0.6), max_per_img=10)
    det = build_detector(model, train_cfg, test_cfg)
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
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["loss_bbox"]) > 0
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 10, 5)


def test_swin_backbone_shapes():
    from oadg_tpu.models.backbones.swin import SwinTransformer
    m = SwinTransformer(embed_dims=24, depths=(1, 1, 2, 1),
                        num_heads=(2, 2, 4, 4), window_size=4)
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 24), (1, 8, 12, 48), (1, 4, 6, 96), (1, 2, 3, 192)]


def test_swin_shifted_window_mask():
    from oadg_tpu.models.backbones.swin import _shift_attn_mask
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # the top-left window is unshifted -> no masking
    assert (m[0] == 0).all()
    # shifted windows must mask some cross-region pairs
    assert (m[-1] == -100.0).any()


def test_mobilenet_v2_shapes():
    from oadg_tpu.models.backbones.mobilenet_v2 import MobileNetV2
    m = MobileNetV2(out_indices=(1, 2, 4, 7))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    # reference layer indexing: 1->24ch/8x, 2->32ch/16x, 4->96ch/16x(s1 stage),
    # 7->final 1280 1x1 conv at 32x
    assert [o.shape[-1] for o in outs] == [24, 32, 96, 1280]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_ssd_vgg_pyramid_shapes():
    from oadg_tpu.models.backbones.ssd_vgg import SSDVGG
    m = SSDVGG(input_size=300)
    x = jnp.zeros((1, 300, 300, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    # SSD300 pyramid: 38, 19, 10, 5, 3, 1 (ceil-mode pooling)
    assert [o.shape[1] for o in outs] == [38, 19, 10, 5, 3, 1]
    assert [o.shape[-1] for o in outs] == [512, 1024, 512, 256, 256, 256]


def test_ssd_anchor_counts():
    from oadg_tpu.core.anchor import SSDAnchorGenerator
    g = SSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        input_size=300, basesize_ratio_range=(0.15, 0.9))
    assert g.num_base_anchors == [4, 6, 6, 6, 4, 4]
    # first level: min size 21 (300*7/100)
    a = g.base_anchors[0][0]
    assert abs((a[2] - a[0]) - 21) < 1e-4


def test_ssd_detector_train_and_test():
    from oadg_tpu.models import build_detector
    model = dict(
        type="SSD",
        backbone=dict(type="SSDVGG", input_size=300),
        neck=None,
        bbox_head=dict(
            type="SSDHead", num_classes=3,
            in_channels=(512, 1024, 512, 256, 256, 256),
            anchor_generator=dict(
                type="SSDAnchorGenerator", input_size=300,
                basesize_ratio_range=(0.15, 0.9),
                strides=[8, 16, 32, 64, 100, 300],
                ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])))
    train_cfg = dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                   min_pos_iou=0.0, gt_max_assign_all=False),
                     neg_pos_ratio=3, smoothl1_beta=1.0)
    test_cfg = dict(score_thr=0.02, nms=dict(iou_threshold=0.45),
                    max_per_img=20)
    det = build_detector(model, train_cfg, test_cfg)
    rng = np.random.RandomState(0)
    b = 1
    batch = {
        "img": jnp.asarray(rng.randn(b, 300, 300, 3).astype(np.float32)),
        "img_shape": jnp.asarray([[300, 300]] * b, jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack([[[30, 30, 120, 120], [150, 60, 280, 260]]] * b)
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
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))
    assert float(losses["loss_bbox"]) > 0
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 20, 5)


def test_hungarian_assigner_exact():
    from oadg_tpu.core.bbox.hungarian import HungarianAssigner
    # 3 queries, 2 gts; query0 perfectly predicts gt1, query2 predicts gt0
    prob = jnp.asarray([[0.0, 0.9, 0.1], [0.3, 0.3, 0.4], [0.9, 0.0, 0.1]])
    boxes = jnp.asarray([[0.7, 0.7, 0.2, 0.2],      # ~gt1
                         [0.5, 0.5, 0.9, 0.9],
                         [0.2, 0.2, 0.2, 0.2]])     # ~gt0
    gt = jnp.asarray([[10.0, 10.0, 30.0, 30.0],     # label 0
                      [60.0, 60.0, 80.0, 80.0],     # label 1
                      [0.0, 0.0, 0.0, 0.0]])
    gtv = jnp.asarray([True, True, False])
    gtl = jnp.asarray([0, 1, 0])
    a = HungarianAssigner().assign(prob, boxes, gt, gtv, gtl,
                                   jnp.asarray([100.0, 100.0]))
    a = np.asarray(a)
    assert a[0] == 2 and a[2] == 1        # one-to-one, padded gt unmatched
    assert (a > 0).sum() == 2


def test_detr_train_and_test():
    from oadg_tpu.models import build_detector
    model = dict(
        type="DETR",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(3,), norm_cfg=dict(type="BN"),
                      base_channels=16),
        bbox_head=dict(type="DETRHead", num_classes=3, in_channels=128,
                       num_query=12, embed_dims=32, num_heads=4,
                       num_encoder_layers=2, num_decoder_layers=2,
                       feedforward_channels=64))
    det = build_detector(model, None, dict(max_per_img=10))
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
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch, "train")
    losses = det.apply(variables, batch, "train")
    # final + 1 aux decoder layer, each with cls/bbox/iou
    assert {"loss_cls", "loss_bbox", "loss_iou", "d0.loss_cls"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_iou"]) > 0
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 10, 5)

    # gradients flow through the Hungarian targets (matching itself is
    # non-differentiable and runs via pure_callback; losses still grad)
    def total(p):
        ls = det.apply({**variables, "params": p}, batch, "train")
        return sum(v for v in ls.values())

    g = jax.grad(total)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_double_head_rcnn():
    from oadg_tpu.models import build_detector
    model = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), norm_cfg=dict(type="BN"),
                      base_channels=16),
        neck=dict(type="FPN", in_channels=[16, 32, 64, 128], out_channels=32,
                  num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[4], ratios=[1.0],
                                            strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="DoubleHeadRoIHead",
            bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                    featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(type="DoubleConvFCBBoxHead", in_channels=32,
                           conv_out_channels=32, fc_out_channels=64,
                           num_convs=2, num_fcs=1, num_classes=3,
                           roi_feat_size=7)))
    train_cfg = dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=32, pos_fraction=0.5),
                 allowed_border=-1, pos_weight=-1),
        rpn_proposal=dict(nms_pre=64, max_per_img=32,
                          nms=dict(iou_threshold=0.7), min_bbox_size=0),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5, match_low_quality=False),
                  sampler=dict(num=32, pos_fraction=0.25), pos_weight=-1))
    test_cfg = dict(
        rpn=dict(nms_pre=64, max_per_img=32, nms=dict(iou_threshold=0.7),
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=8))
    det = build_detector(model, train_cfg, test_cfg)
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
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 8, 5)


def test_regnet_shapes():
    from oadg_tpu.models.backbones.regnet import RegNet
    m = RegNet(arch=dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert len(outs) >= 3
    # strides 4, 8, ... from a stride-2 stem + stride-2 stages
    assert outs[0].shape[1] == 16 and outs[1].shape[1] == 8
    # widths are multiples of the group width (16)
    assert all(o.shape[-1] % 8 == 0 for o in outs)


def test_models_utils_surface():
    from oadg_tpu.models.utils import (NormedLinear, ResLayer, SELayer,
                                       gaussian_radius, gen_gaussian_target,
                                       interpolate_as)
    # NormedLinear: output invariant to input scale
    m = NormedLinear(4, tempearture=10.0)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.ones((2, 8)))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.float32)
    y1 = m.apply(v, x)
    y2 = m.apply(v, x * 100.0)
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-3)

    se = SELayer(ratio=4)
    v = jax.jit(se.init)(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 8)))
    out = se.apply(v, jnp.ones((1, 4, 4, 8)))
    assert out.shape == (1, 4, 4, 8)

    r = float(gaussian_radius((10.0, 10.0), 0.7))
    assert 0 < r < 10

    hm = gen_gaussian_target(jnp.zeros((16, 16)), (8.0, 8.0), 3.0)
    assert abs(float(hm[8, 8]) - 1.0) < 1e-5
    assert float(hm[0, 0]) < 0.01

    src = jnp.ones((1, 4, 4, 2))
    tgt = jnp.zeros((1, 8, 8, 2))
    assert interpolate_as(src, tgt).shape == (1, 8, 8, 2)

    rl = ResLayer(depth=18, stage=3, stride=2)
    v = jax.jit(rl.init)(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 256)))
    out = rl.apply(v, jnp.ones((1, 8, 8, 256)))
    assert out.shape == (1, 4, 4, 512)


def test_centernet_train_and_test():
    from oadg_tpu.models import build_detector
    model = dict(
        type="CenterNet",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(1,), norm_cfg=dict(type="BN"),
                      base_channels=16),
        bbox_head=dict(type="CenterNetHead", num_classes=3, in_channels=32,
                       feat_channels=32, stride=8))
    det = build_detector(model, None, dict(max_per_img=16))
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
    for k in ("loss_center_heatmap", "loss_wh", "loss_offset"):
        assert np.isfinite(float(losses[k])), k
        assert float(losses[k]) > 0, k
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (b, 16, 5)
