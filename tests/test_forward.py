"""Forward smoke tests: build detectors from config dicts and run
forward_train / simple_test on tiny synthetic batches (the reference's
tests/test_models/test_forward.py pattern, shrunk for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oadg_tpu.models import build_detector

BASE_MODEL = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=True),
                  norm_eval=True, style='pytorch', base_channels=16,
                  stem_channels=16),
    neck=dict(type='FPN', in_channels=[16, 32, 64, 128], out_channels=16,
              num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=16, feat_channels=16,
                  anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64]),
                  bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                  target_means=[.0, .0, .0, .0],
                                  target_stds=[1.0, 1.0, 1.0, 1.0]),
                  loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                                loss_weight=1.0),
                  loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
    roi_head=dict(type='StandardRoIHead',
                  bbox_roi_extractor=dict(
                      type='SingleRoIExtractor',
                      roi_layer=dict(type='RoIAlign', output_size=7,
                                     sampling_ratio=0),
                      out_channels=16, featmap_strides=[4, 8, 16, 32]),
                  bbox_head=dict(type='Shared2FCBBoxHead', in_channels=16,
                                 fc_out_channels=32, roi_feat_size=7,
                                 num_classes=8,
                                 bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                                 target_means=[0., 0., 0., 0.],
                                                 target_stds=[0.1, 0.1, 0.2, 0.2]),
                                 reg_class_agnostic=False,
                                 loss_cls=dict(type='CrossEntropyLoss',
                                               use_sigmoid=False,
                                               loss_weight=1.0),
                                 loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                                                loss_weight=1.0))))

TRAIN_CFG = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                          neg_pos_ub=-1, add_gt_as_proposals=False),
             allowed_border=-1, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_pre=100, max_per_img=40,
                      nms=dict(type='nms', iou_threshold=0.7),
                      min_bbox_size=0),
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False, ignore_iof_thr=-1),
              sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                           neg_pos_ub=-1, add_gt_as_proposals=True),
              pos_weight=-1, debug=False))

TEST_CFG = dict(
    rpn=dict(nms_pre=60, max_per_img=30,
             nms=dict(type='nms', iou_threshold=0.7), min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
              max_per_img=10))


def _batch(n=2, h=64, w=80, g=4, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.zeros((n, g, 4), np.float32)
    gt[..., 0] = rng.uniform(0, w // 2, (n, g))
    gt[..., 1] = rng.uniform(0, h // 2, (n, g))
    gt[..., 2] = gt[..., 0] + rng.uniform(8, w // 2, (n, g))
    gt[..., 3] = gt[..., 1] + rng.uniform(8, h // 2, (n, g))
    gt[..., 2] = np.minimum(gt[..., 2], w)
    gt[..., 3] = np.minimum(gt[..., 3], h)
    return {
        "img": jnp.asarray(rng.randn(n, h, w, 3).astype(np.float32)),
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(rng.randint(0, 8, (n, g)), jnp.int32),
        "gt_valid": jnp.asarray([[True, True, True, False]] * n),
        "img_shape": jnp.asarray([[h, w]] * n, jnp.float32),
        "scale_factor": jnp.ones((n, 4), jnp.float32),
    }


@pytest.fixture(scope="module")
def frcnn():
    det = build_detector(BASE_MODEL, TRAIN_CFG, TEST_CFG)
    batch = _batch()
    variables = det.init({"params": jax.random.PRNGKey(0),
                          "sampling": jax.random.PRNGKey(1)}, batch, "train")
    return det, variables


def test_faster_rcnn_forward_train(frcnn):
    det, variables = frcnn
    batch = _batch()
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert k in losses, losses.keys()
        assert np.isfinite(float(losses[k])), (k, losses[k])


def test_faster_rcnn_forward_train_grads(frcnn):
    det, variables = frcnn
    batch = _batch(seed=3)

    def total(params):
        losses = det.apply({**variables, "params": params}, batch, "train",
                           rngs={"sampling": jax.random.PRNGKey(4)})
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    g = jax.grad(total)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_faster_rcnn_simple_test(frcnn):
    det, variables = frcnn
    batch = _batch(seed=5)
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape == (2, 10, 5)
    assert labels.shape == (2, 10)
    assert valid.dtype == jnp.bool_


def test_oadg_contrastive_forward_train():
    model = dict(BASE_MODEL)
    model["roi_head"] = dict(
        type='ContrastiveRoIHead',
        bbox_roi_extractor=BASE_MODEL["roi_head"]["bbox_roi_extractor"],
        bbox_head=dict(type='Shared2FCContrastiveHead', in_channels=16,
                       fc_out_channels=32, roi_feat_size=7, num_classes=8,
                       bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                       target_means=[0., 0., 0., 0.],
                                       target_stds=[0.1, 0.1, 0.2, 0.2]),
                       cont_predictor_cfg=dict(num_linear=2, feat_channels=16,
                                               return_relu=True),
                       loss_cls=dict(type='CrossEntropyLossPlus',
                                     use_sigmoid=False, loss_weight=1.0,
                                     num_views=2,
                                     additional_loss='jsdv1_3_2aug',
                                     lambda_weight=10),
                       loss_bbox=dict(type='SmoothL1LossPlus', beta=1.0,
                                      loss_weight=1.0, num_views=2,
                                      additional_loss="None"),
                       loss_cont=dict(type='ContrastiveLossPlus',
                                      loss_weight=0.01, temperature=0.06,
                                      num_views=2, min_samples=2)))
    model["rpn_head"] = dict(BASE_MODEL["rpn_head"])
    model["rpn_head"]["loss_cls"] = dict(
        type='CrossEntropyLossPlus', use_sigmoid=True, loss_weight=1.0,
        num_views=2, additional_loss='jsdv1_3_2aug', lambda_weight=0.1)
    model["rpn_head"]["loss_bbox"] = dict(type='L1LossPlus', loss_weight=1.0,
                                          num_views=2, additional_loss="None")
    tc = dict(TRAIN_CFG)
    tc["random_proposal_cfg"] = dict(bbox_from='oagrb', num_bboxes=6,
                                     scales=(0.01, 0.3), ratios=(0.3, 1 / 0.3),
                                     iou_max=0.7, iou_min=0.0)
    det = build_detector(model, tc, TEST_CFG, num_views=2)

    b = _batch(n=4)    # views-major: imgs 0-1 clean, 2-3 aug
    b["multilevel_boxes"] = jnp.asarray(
        np.tile(np.array([[[2., 2., 20., 20.], [30., 30., 60., 50.]]],
                         np.float32), (4, 1, 1)))
    b["oamix_boxes"] = jnp.asarray(
        np.tile(np.array([[[4., 4., 16., 16.]]], np.float32), (4, 1, 1)))
    variables = det.init({"params": jax.random.PRNGKey(0),
                          "sampling": jax.random.PRNGKey(1)}, b, "train")
    losses = det.apply(variables, b, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox",
              "loss_cont"):
        assert k in losses
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))


def test_reg_decoded_bbox_giou_and_soft_nms():
    """faster_rcnn IoU-loss family (reg_decoded_bbox=True + GIoULoss) and
    the soft_nms rcnn test_cfg variant
    (reference configs/faster_rcnn/faster_rcnn_r50_fpn_{giou,soft_nms}_1x)."""
    import copy
    model = copy.deepcopy(BASE_MODEL)
    model["roi_head"]["bbox_head"].update(
        reg_decoded_bbox=True,
        loss_bbox=dict(type="GIoULoss", loss_weight=10.0))
    test_cfg = copy.deepcopy(TEST_CFG)
    test_cfg["rcnn"]["nms"] = dict(type="soft_nms", iou_threshold=0.5,
                                   min_score=0.01)
    det = build_detector(model, TRAIN_CFG, test_cfg)
    batch = _batch()
    variables = det.init({"params": jax.random.PRNGKey(0),
                          "sampling": jax.random.PRNGKey(1)}, batch, "train")
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses["loss_bbox"]))
    # GIoU loss on decoded boxes is bounded by loss_weight * 2
    assert 0.0 <= float(losses["loss_bbox"]) <= 20.0

    grads = jax.grad(lambda p: sum(
        v for k, v in det.apply({**variables, "params": p}, batch, "train",
                                rngs={"sampling": jax.random.PRNGKey(2)}
                                ).items() if "loss" in k))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)

    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape[1] == 10 and bool(jnp.all(jnp.isfinite(dets)))


def test_faster_rcnn_c4_shared_head_forward():
    """C4 architecture (reference _base_/models/faster_rcnn_r50_caffe_c4):
    3-stage backbone, no neck, RPN on the single C4 level, ResLayer res5
    shared head on 14x14 rois, avg-pooled BBoxHead."""
    norm_cfg = dict(type='BN', requires_grad=False)
    model = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=50, num_stages=3,
                      strides=(1, 2, 2), dilations=(1, 1, 1),
                      out_indices=(2,), frozen_stages=1, norm_cfg=norm_cfg,
                      style='caffe', base_channels=8, stem_channels=8),
        rpn_head=dict(type='RPNHead', in_channels=128, feat_channels=32,
                      anchor_generator=dict(scales=[2, 4], ratios=[1.0],
                                            strides=[16])),
        roi_head=dict(
            type='StandardRoIHead',
            shared_head=dict(type='ResLayer', depth=50, stage=3, stride=2,
                             style='caffe', norm_cfg=norm_cfg),
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=0),
                out_channels=128, featmap_strides=[16]),
            bbox_head=dict(type='BBoxHead', with_avg_pool=True,
                           in_channels=256, num_classes=8)))
    # shrink ResLayer too: base_channels=8 -> stage3 planes=64*8? ResLayer
    # derives planes from 64 * 2**stage; keep depth-50 geometry but the
    # backbone emits 8*(2**2)*4 = 128 channels, and ResLayer's downsample
    # adapts via its 1x1 conv.
    train_cfg = dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=32, pos_fraction=0.5,
                              add_gt_as_proposals=False)),
        rpn_proposal=dict(nms_pre=60, max_per_img=30,
                          nms=dict(iou_threshold=0.7), min_bbox_size=0),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5, match_low_quality=False),
                  sampler=dict(num=16, pos_fraction=0.25)))
    test_cfg = dict(
        rpn=dict(nms_pre=40, max_per_img=20, nms=dict(iou_threshold=0.7),
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=5))
    det = build_detector(model, train_cfg, test_cfg)
    batch = _batch(h=64, w=64)
    variables = det.init({"params": jax.random.PRNGKey(0),
                          "sampling": jax.random.PRNGKey(1)}, batch, "train")
    # the ResLayer (res5) params must exist under the roi head
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths = ["/".join(str(getattr(p, "key", p)) for p in k)
             for k, _ in flat]
    assert any("shared_head_m" in p and "layer4" in p for p in paths), paths[:5]
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses["loss_cls"]))
    dets, labels, valid = det.apply(variables, batch, "test")
    assert dets.shape[1] == 5 and bool(jnp.all(jnp.isfinite(dets)))


def test_rpn_allowed_border_filters_outside_anchors():
    """allowed_border=0 (e.g. the C4 recipe) excludes anchors crossing the
    image border from assignment/sampling (reference anchor_head
    inside_flags); allowed_border=-1 keeps them all."""
    from oadg_tpu.models.dense_heads.rpn_head import RPNHead
    import copy
    common = dict(in_channels=8, feat_channels=8,
                  anchor_generator=dict(scales=[2], ratios=[1.0],
                                        strides=[8]),
                  train_cfg=dict(
                      assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                    min_pos_iou=0.3),
                      sampler=dict(num=512, pos_fraction=0.5),
                      allowed_border=0))
    head = RPNHead(**common)
    x = [jnp.zeros((1, 8, 8, 8), jnp.float32)]
    gt = jnp.asarray([[[4.0, 4, 60, 60]]])
    gtv = jnp.ones((1, 1), bool)
    variables = head.init(jax.random.PRNGKey(0), x)
    cls_scores, bbox_preds = head.apply(variables, x)

    def n_sampled(img_shapes):
        # reach into loss internals by reusing the public API: the number
        # of sampled anchors shows in the cls avg_factor; compare loss
        # values instead — with a tiny valid region only few anchors are
        # eligible, so the sampled count (and thus avg_factor) changes.
        losses = head.apply(variables, x, cls_scores, bbox_preds, gt, gtv,
                            jax.random.PRNGKey(1), img_shapes,
                            method=lambda m, x_, c, b, g, gv, r, s:
                            m.loss(c, b, g, gv, r, img_shapes=s))
        return losses

    # full 64x64 image: center anchors are inside; tiny 8x8 valid region:
    # nearly every anchor crosses the border -> losses must differ
    l_full = n_sampled(jnp.asarray([[64.0, 64.0]]))
    l_tiny = n_sampled(jnp.asarray([[8.0, 8.0]]))
    assert float(l_full["loss_rpn_cls"]) != float(l_tiny["loss_rpn_cls"])
    # and with border filtering off, the shape has no effect
    common2 = copy.deepcopy(common)
    common2["train_cfg"]["allowed_border"] = -1
    head2 = RPNHead(**common2)
    v2 = head2.init(jax.random.PRNGKey(0), x)
    def loss2(shapes):
        return head2.apply(v2, x, cls_scores, bbox_preds, gt, gtv,
                           jax.random.PRNGKey(1), shapes,
                           method=lambda m, x_, c, b, g, gv, r, s:
                           m.loss(c, b, g, gv, r, img_shapes=s))
    assert float(loss2(jnp.asarray([[64.0, 64.0]]))["loss_rpn_cls"]) == \
        float(loss2(jnp.asarray([[8.0, 8.0]]))["loss_rpn_cls"])
