# Res2Net-101 Faster R-CNN (reference configs/res2net schema).
_base_ = ['/ws/external/configs/_base_/models/faster_rcnn_r50_fpn.py',
          '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
          '/ws/external/configs/_base_/default_runtime.py']
model = dict(
    backbone=dict(_delete_=True, type='Res2Net', depth=101, scales=4,
                  base_width=26, num_stages=4, out_indices=(0, 1, 2, 3),
                  frozen_stages=1, norm_cfg=dict(type='BN',
                                                 requires_grad=True),
                  norm_eval=True, style='pytorch'))
