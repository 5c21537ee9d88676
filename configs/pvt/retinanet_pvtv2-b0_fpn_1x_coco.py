# PVTv2-B0 RetinaNet (reference configs/pvt schema).
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
    type='RetinaNet',
    backbone=dict(type='PyramidVisionTransformerV2',
                  embed_dims=[32, 64, 160, 256],
                  num_heads=[1, 2, 5, 8], num_layers=[2, 2, 2, 2]),
    neck=dict(type='FPN', in_channels=[32, 64, 160, 256],
              out_channels=256, start_level=1,
              add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=80, in_channels=256,
                   stacked_convs=4, feat_channels=256),
    train_cfg=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                 min_pos_iou=0)),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.5), max_per_img=100))
