# CornerNet (reference configs/cornernet schema).
_base_ = [
    '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
    '/ws/external/configs/_base_/default_runtime.py',
]
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)

model = dict(
    type='CornerNet',
    backbone=dict(type='HourglassNet', downsample_times=5, num_stacks=2,
                  stage_channels=[256, 256, 384, 384, 384, 512],
                  stage_blocks=[2, 2, 2, 2, 2, 4], feat_channel=256),
    neck=None,
    bbox_head=dict(type='CornerHead', num_classes=80, in_channels=256,
                   num_feat_levels=2),
    train_cfg=dict(),
    test_cfg=dict(corner_topk=100, max_per_img=100,
                  distance_threshold=0.5))
