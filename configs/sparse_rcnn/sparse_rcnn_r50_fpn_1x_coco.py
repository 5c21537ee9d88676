# Sparse R-CNN (reference configs/sparse_rcnn schema).
_base_ = [
    '/ws/external/configs/_base_/datasets/cityscapes_detection.py',
    '/ws/external/configs/_base_/default_runtime.py',
]
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)

num_proposals = 100
model = dict(
    type='SparseRCNN',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, norm_cfg=dict(type='BN', requires_grad=True),
        norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=0, num_outs=4),
    rpn_head=dict(type='EmbeddingRPNHead', num_proposals=num_proposals,
                  proposal_feature_channel=256),
    roi_head=dict(
        type='SparseRoIHead', num_stages=6,
        stage_loss_weights=[1.0] * 6, proposal_feature_channel=256,
        bbox_roi_extractor=dict(roi_layer=dict(type='RoIAlign',
                                               output_size=7,
                                               sampling_ratio=2),
                                featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(num_classes=80, feat_channels=256,
                       dim_feedforward=2048, num_heads=8,
                       dynamic_dim=64)),
    test_cfg=dict(max_per_img=num_proposals))
