# Deformable DETR (reference configs/deformable_detr schema).
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
    type='DeformableDETR',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='pytorch'),
    neck=dict(type='ChannelMapper', in_channels=[512, 1024, 2048],
              out_channels=256, num_outs=4),
    bbox_head=dict(type='DeformableDETRHead', num_classes=80,
                   num_query=300, embed_dims=256, num_heads=8,
                   num_encoder_layers=6, num_decoder_layers=6,
                   feedforward_channels=1024, with_box_refine=False),
    train_cfg=dict(assigner=dict(type='HungarianAssigner',
                                 cls_cost=dict(weight=2.0),
                                 reg_cost=dict(weight=5.0),
                                 iou_cost=dict(weight=2.0))),
    test_cfg=dict(max_per_img=100))
