# RPN proposal-only (reference configs/rpn schema).
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
    type='RPN',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, norm_cfg=dict(type='BN', requires_grad=True),
        norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256),
    roi_head=None,
    train_cfg=dict(rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                          min_pos_iou=0.3),
                            sampler=dict(num=256, pos_fraction=0.5))),
    test_cfg=dict(rpn=dict(nms_pre=2000, max_per_img=1000,
                           nms=dict(iou_threshold=0.7))))
