# Faster R-CNN X101-32x4d-FPN 1x COCO.
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(backbone=dict(
    type='ResNeXt', depth=101, groups=32, base_width=4,
    num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
    norm_cfg=dict(type='BN', requires_grad=True), style='pytorch'))
