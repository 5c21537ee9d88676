# RegNetX-3.2GF Faster R-CNN (reference configs/regnet schema).
_base_ = ['/ws/external/configs/_base_/models/faster_rcnn_r50_fpn.py',
          '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
          '/ws/external/configs/_base_/default_runtime.py']
model = dict(
    backbone=dict(_delete_=True, type='RegNet', arch='regnetx_3.2gf',
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=True),
                  norm_eval=True),
    neck=dict(in_channels=[96, 192, 432, 1008]))
