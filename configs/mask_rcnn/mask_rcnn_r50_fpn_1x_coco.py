# Mask R-CNN R50-FPN (reference configs/mask_rcnn schema).
_base_ = [
    '/ws/external/configs/_base_/models/mask_rcnn_r50_fpn.py',
    '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
    '/ws/external/configs/_base_/default_runtime.py',
]
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
