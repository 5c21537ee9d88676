"""Mask R-CNN branch: FCNMaskHead, static-shape mask targets, mask
structures (reference mmdet/models/roi_heads/mask_heads/fcn_mask_head.py,
mmdet/core/mask/structures.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.core.mask import BitmapMasks, PolygonMasks, paste_masks
from oadg_tpu.models import build_detector
from oadg_tpu.models.roi_heads.mask_heads import (mask_targets,
                                                  resample_box_to_box)


def test_resample_identity():
    m = jnp.asarray(np.random.RandomState(0).rand(16, 16) > 0.5,
                    jnp.float32)
    box = jnp.asarray([4.0, 8.0, 36.0, 40.0])
    out = resample_box_to_box(m, box, box, 16)
    assert np.allclose(np.asarray(out), np.asarray(m), atol=1e-5)


def test_resample_subwindow():
    # mask = left half on; proposal covering the left half of the gt box
    m = jnp.zeros((16, 16)).at[:, :8].set(1.0)
    gt = jnp.asarray([0.0, 0.0, 32.0, 32.0])
    left = jnp.asarray([0.0, 0.0, 16.0, 32.0])
    out = resample_box_to_box(m, gt, left, 8)
    assert float(out.mean()) > 0.95          # entirely inside the on-half
    right = jnp.asarray([16.0, 0.0, 32.0, 32.0])
    out = resample_box_to_box(m, gt, right, 8)
    assert float(out.mean()) < 0.05


def test_resample_outside_is_zero():
    m = jnp.ones((8, 8))
    gt = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    outside = jnp.asarray([20.0, 20.0, 30.0, 30.0])
    out = resample_box_to_box(m, gt, outside, 8)
    assert float(jnp.abs(out).max()) == 0.0


def test_mask_targets_binary():
    masks = jnp.asarray(np.random.RandomState(1).rand(3, 16, 16),
                        jnp.float32)
    gtb = jnp.tile(jnp.asarray([0.0, 0.0, 32.0, 32.0]), (3, 1))
    pb = jnp.tile(jnp.asarray([8.0, 8.0, 24.0, 24.0]), (3, 1))
    t = mask_targets(pb, gtb, masks, 28)
    assert t.shape == (3, 28, 28)
    assert set(np.unique(np.asarray(t))) <= {0.0, 1.0}


MASK_MODEL = dict(
    type="MaskRCNN",
    backbone=dict(type="ResNet", depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), norm_cfg=dict(type="BN"),
                  base_channels=16),
    neck=dict(type="FPN", in_channels=[16, 32, 64, 128], out_channels=32,
              num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                  anchor_generator=dict(scales=[4], ratios=[1.0],
                                        strides=[4, 8, 16, 32, 64])),
    roi_head=dict(
        type="StandardRoIHead",
        bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="Shared2FCBBoxHead", in_channels=32,
                       fc_out_channels=64, num_classes=3,
                       roi_feat_size=7),
        mask_roi_extractor=dict(roi_layer=dict(output_size=14),
                                featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=32,
                       conv_out_channels=32, num_classes=3)),
)
TRAIN_CFG = dict(
    rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3),
             sampler=dict(num=32, pos_fraction=0.5),
             allowed_border=-1, pos_weight=-1),
    rpn_proposal=dict(nms_pre=64, max_per_img=32,
                      nms=dict(iou_threshold=0.7), min_bbox_size=0),
    rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                            min_pos_iou=0.5, match_low_quality=False),
              sampler=dict(num=32, pos_fraction=0.25),
              mask_size=28, pos_weight=-1))
TEST_CFG = dict(
    rpn=dict(nms_pre=64, max_per_img=32, nms=dict(iou_threshold=0.7),
             min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=8))


def _mask_batch():
    rng = np.random.RandomState(0)
    b, h, w, g, m0 = 2, 64, 96, 4, 56
    return {
        "img": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "img_shape": jnp.asarray([[h, w]] * b, jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack([np.stack([[8, 8, 40, 40], [50, 20, 80, 56],
                                [0, 0, 0, 0], [0, 0, 0, 0]])] * b)
            .astype(np.float32)),
        "gt_labels": jnp.asarray(np.stack([[0, 2, 0, 0]] * b)),
        "gt_valid": jnp.asarray(np.stack([[True, True, False, False]] * b)),
        "gt_masks": jnp.asarray(
            (rng.rand(b, g, m0, m0) > 0.5).astype(np.float32)),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }


@pytest.fixture(scope="module")
def mask_det():
    det = build_detector(MASK_MODEL, TRAIN_CFG, TEST_CFG)
    batch = _mask_batch()
    variables = jax.jit(lambda r, b: det.init(r, b, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    return det, variables, batch


def test_maskrcnn_train_has_mask_loss(mask_det):
    det, variables, batch = mask_det
    losses = det.apply(variables, batch, "train",
                       rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    assert float(losses["loss_mask"]) > 0


def test_maskrcnn_mask_grads_flow(mask_det):
    det, variables, batch = mask_det

    def mask_loss(p):
        losses = det.apply({**variables, "params": p}, batch, "train",
                           rngs={"sampling": jax.random.PRNGKey(3)})
        return losses["loss_mask"]

    g = jax.grad(mask_loss)(variables["params"])
    leaves = {k: v for k, v in jax.tree_util.tree_leaves_with_path(g)}
    mask_grads = [v for k, v in leaves.items() if "mask" in str(k).lower()]
    assert mask_grads and any(float(jnp.abs(m).max()) > 0 for m in mask_grads)


def test_maskrcnn_test_returns_masks(mask_det):
    det, variables, batch = mask_det
    out = det.apply(variables, batch, "test")
    assert len(out) == 4
    dets, labels, valid, masks = out
    assert masks.shape[:2] == dets.shape[:2]
    assert masks.shape[2] == masks.shape[3] == 28
    m = np.asarray(masks)
    assert ((m >= 0) & (m <= 1)).all()


def test_bitmap_masks_ops():
    m = np.zeros((2, 20, 30), np.uint8)
    m[0, 5:15, 5:25] = 1
    m[1, 0:10, 0:10] = 1
    bm = BitmapMasks(m, 20, 30)
    assert bm.areas.tolist() == [200.0, 100.0]
    assert bm.flip("horizontal").masks[0, 10, 29 - 10] == m[0, 10, 10]
    r = bm.resize((10, 15))
    assert r.masks.shape == (2, 10, 15)
    boxes = bm.get_bboxes()
    assert boxes[0].tolist() == [5, 5, 25, 15]
    crop = bm.to_box_cropped(boxes, m0=8)
    assert crop.shape == (2, 8, 8) and crop[0].min() == 1.0


def test_polygon_masks_rasterize():
    # square polygon 10..20
    poly = [np.array([10, 10, 20, 10, 20, 20, 10, 20], np.float64)]
    pm = PolygonMasks([poly], 32, 32)
    bm = pm.to_bitmap()
    area = bm.areas[0]
    assert 80 <= area <= 120           # ~10x10
    assert bm.masks[0, 15, 15] == 1 and bm.masks[0, 5, 5] == 0


def test_paste_masks_roundtrip():
    probs = np.ones((1, 28, 28), np.float32)
    out = paste_masks(probs, np.array([[10.0, 12.0, 30.0, 28.0]]), 40, 50)
    assert out.shape == (1, 40, 50)
    assert out[0, 20, 20] == 1 and out[0, 5, 5] == 0
    assert abs(int(out.sum()) - 20 * 16) <= 40


def test_load_annotations_with_mask_and_batcher():
    from oadg_tpu.data.pipelines.loading import LoadAnnotations
    from oadg_tpu.data.pipelines.transforms import RandomFlip
    from oadg_tpu.data.builder import StaticBatcher
    img = np.zeros((40, 60, 3), np.uint8)
    poly = [np.array([10, 10, 30, 10, 30, 30, 10, 30], np.float64)]
    results = {
        "img": img, "img_shape": (40, 60, 3),
        "img_info": {"height": 40, "width": 60},
        "ann_info": dict(
            bboxes=np.array([[10, 10, 30, 30]], np.float32),
            labels=np.array([1]), masks=[poly]),
        "img_fields": ["img"],
    }
    out = LoadAnnotations(with_mask=True)(dict(results))
    assert out["gt_masks"].shape == (1, 56, 56)
    assert out["gt_masks"].mean() > 0.9          # box fully covered by poly
    # flip keeps crop shape, flips content
    asym = dict(out)
    asym["gt_masks"] = np.zeros((1, 56, 56), np.float32)
    asym["gt_masks"][0, :, :28] = 1.0
    asym["flip"] = True
    asym["flip_direction"] = "horizontal"
    flipped = RandomFlip(flip_ratio=1.0)(asym)
    assert flipped["gt_masks"][0, 0, 0] == 0.0
    assert flipped["gt_masks"][0, 0, -1] == 1.0
    # batcher pads to (B, G, M0, M0)
    out["img_metas"] = {"img_shape": (40, 60, 3)}
    batch = StaticBatcher(static_hw=(64, 64), max_gt=8)([out, out])
    assert batch["gt_masks"].shape == (2, 8, 56, 56)
    assert batch["gt_masks"][0, 0].mean() > 0.9
    assert batch["gt_masks"][0, 1].sum() == 0
