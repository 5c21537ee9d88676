# Swin-T Mask R-CNN (reference configs/swin schema).
_base_ = ['/ws/external/configs/_base_/models/mask_rcnn_r50_fpn.py',
          '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
          '/ws/external/configs/_base_/default_runtime.py']
model = dict(
    backbone=dict(
        _delete_=True, type='SwinTransformer', embed_dims=96,
        depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], window_size=7,
        mlp_ratio=4, out_indices=(0, 1, 2, 3), convert_weights=True),
    neck=dict(in_channels=[96, 192, 384, 768]))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.05)
