# Plain Faster R-CNN R50-FPN on Cityscapes (reference
# configs/OA-DG/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py, with
# /ws/external paths normalized into this repo's configs/ tree).
_base_ = [
    '/ws/external/configs/_base_/models/faster_rcnn_r50_fpn.py',
    '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
    '/ws/external/configs/_base_/default_runtime.py',
]

model = dict(
    backbone=dict(init_cfg=None),
    roi_head=dict(
        bbox_head=dict(
            num_classes=8,
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))),
    train_cfg=dict(
        rcnn=dict(dropout=False),
        wandb=dict(log=dict(features_list=[], vars=['log_vars'])),
    ))

data = dict(samples_per_gpu=2, workers_per_gpu=4)

# lr is set for a total batch size of 8
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[1])
runner = dict(type='EpochBasedRunner', max_epochs=2)  # x Repeat(8) = 16 eff.

log_config = dict(interval=100, hooks=[dict(type='TextLoggerHook')])
custom_hooks = []

# COCO-pretrained init (converted via tools/model_converters/torch_to_jax.py)
load_from = None
