# CenterNet R18 (reference configs/centernet schema).
_base_ = ['/ws/external/configs/_base_/default_runtime.py']
model = dict(
    type='CenterNet',
    backbone=dict(type='ResNet', depth=18, num_stages=4, out_indices=(1,),
                  norm_cfg=dict(type='BN')),
    bbox_head=dict(type='CenterNetHead', num_classes=80, in_channels=128,
                   feat_channels=128, stride=8,
                   loss_center_heatmap=dict(type='GaussianFocalLoss',
                                            loss_weight=1.0),
                   loss_wh=dict(type='L1Loss', loss_weight=0.1),
                   loss_offset=dict(type='L1Loss', loss_weight=1.0)),
    train_cfg=None,
    test_cfg=dict(topk=100, local_maximum_kernel=3, max_per_img=100))
optimizer = dict(type='SGD', lr=0.00125, momentum=0.9, weight_decay=0.0001)
