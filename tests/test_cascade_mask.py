"""Cascade Mask R-CNN: a CascadeRoIHead config with a mask head routes to
the HTC machinery without semantic branch / info flow (reference
cascade_roi_head.py mask path == HTC minus those two), producing
per-stage mask losses."""
import os
import sys

import pytest
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oadg_tpu.models import build_detector


@pytest.mark.slow
def test_cascade_mask_train_has_per_stage_mask_losses():
    model = dict(
        type='CascadeRCNN',
        backbone=dict(type='ResNet', depth=18, base_channels=8,
                      stem_channels=8, out_indices=(0, 1, 2, 3)),
        neck=dict(type='FPN', in_channels=[8, 16, 32, 64], out_channels=8,
                  num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=8, feat_channels=8,
                      anchor_generator=dict(scales=[8], ratios=[1.0],
                                            strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type='CascadeRoIHead', num_stages=2,
            stage_loss_weights=[1, 0.5],
            bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                    out_channels=8,
                                    featmap_strides=[4, 8, 16, 32]),
            bbox_head=[dict(type='Shared2FCBBoxHead', in_channels=8,
                            fc_out_channels=16, num_classes=3,
                            reg_class_agnostic=True)] * 2,
            mask_roi_extractor=dict(roi_layer=dict(output_size=14),
                                    out_channels=8,
                                    featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(type='FCNMaskHead', num_convs=1, in_channels=8,
                           conv_out_channels=8, num_classes=3)))
    train_cfg = dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=16, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=40, max_per_img=20,
                          nms=dict(iou_threshold=0.7), min_bbox_size=0),
        rcnn=[dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                 min_pos_iou=0.5, match_low_quality=False),
                   sampler=dict(num=8, pos_fraction=0.5), mask_size=14),
              dict(assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6,
                                 min_pos_iou=0.6, match_low_quality=False),
                   sampler=dict(num=8, pos_fraction=0.5), mask_size=14)])
    test_cfg = dict(
        rpn=dict(nms_pre=30, max_per_img=15, nms=dict(iou_threshold=0.7),
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=5))
    det = build_detector(model, train_cfg, test_cfg)
    rng = np.random.RandomState(0)
    h = w = 64
    batch = {
        'img': jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32)),
        'gt_bboxes': jnp.asarray([[[4., 4, 40, 40], [10, 10, 30, 50]]]),
        'gt_labels': jnp.asarray([[0, 2]], jnp.int32),
        'gt_valid': jnp.ones((1, 2), bool),
        'img_shape': jnp.asarray([[h, w]], jnp.float32),
        'scale_factor': jnp.ones((1, 4), jnp.float32),
        'gt_masks': jnp.asarray(rng.rand(1, 2, 28, 28) > 0.5
                                ).astype(jnp.float32),
    }
    variables = det.init({'params': jax.random.PRNGKey(0),
                          'sampling': jax.random.PRNGKey(1)}, batch, 'train')
    losses = det.apply(variables, batch, 'train',
                       rngs={'sampling': jax.random.PRNGKey(2)})
    for k in ('s0.loss_mask', 's1.loss_mask', 's0.loss_cls', 's1.loss_cls'):
        assert k in losses and np.isfinite(float(losses[k])), (k, losses)
