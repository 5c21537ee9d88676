# TridentNet (reference configs/tridentnet schema).
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
    type='TridentFasterRCNN',
    backbone=dict(type='TridentResNet', depth=50, num_branch=3,
                  test_branch_idx=1, trident_dilations=(1, 2, 3),
                  style='caffe'),
    neck=None,
    rpn_head=dict(
        type='RPNHead', in_channels=2048, feat_channels=256,
        anchor_generator=dict(type='AnchorGenerator', scales=[2, 4, 8, 16, 32],
                              ratios=[0.5, 1.0, 2.0], strides=[16])),
    roi_head=dict(
        type='TridentRoIHead', num_branch=3, test_branch_idx=1,
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0),
            out_channels=2048, featmap_strides=[16]),
        bbox_head=dict(type='Shared2FCBBoxHead', in_channels=2048,
                       fc_out_channels=1024, num_classes=80)),
    train_cfg=dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(type='RandomSampler', num=256,
                              pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000,
                          nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5,
                                match_low_quality=False),
                  sampler=dict(type='RandomSampler', num=512,
                               pos_fraction=0.25), mask_size=28,
                  pos_weight=-1)),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000,
                 nms=dict(type='nms', iou_threshold=0.7)),
        rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
                  max_per_img=100)))
