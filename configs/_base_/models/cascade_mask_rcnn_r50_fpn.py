# Cascade Mask R-CNN R50-FPN base model (reference configs/_base_/models/
# cascade_mask_rcnn_r50_fpn.py key/value contract). CascadeRoIHead with a
# mask head routes to the HTC machinery without semantic/info-flow.
_base_ = './cascade_rcnn_r50_fpn.py'
model = dict(
    type='CascadeRCNN',
    roi_head=dict(
        type='CascadeRoIHead',
        mask_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(
            type='FCNMaskHead', num_convs=4, in_channels=256,
            conv_out_channels=256, num_classes=80,
            loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                           loss_weight=1.0))),
    train_cfg=dict(rcnn=[
        dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                           neg_iou_thr=0.5, min_pos_iou=0.5,
                           match_low_quality=False, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                          neg_pos_ub=-1, add_gt_as_proposals=True),
             mask_size=28, pos_weight=-1, debug=False),
        dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                           neg_iou_thr=0.6, min_pos_iou=0.6,
                           match_low_quality=False, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                          neg_pos_ub=-1, add_gt_as_proposals=True),
             mask_size=28, pos_weight=-1, debug=False),
        dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.7, min_pos_iou=0.7,
                           match_low_quality=False, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                          neg_pos_ub=-1, add_gt_as_proposals=True),
             mask_size=28, pos_weight=-1, debug=False),
    ]),
    test_cfg=dict(rcnn=dict(
        score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
        max_per_img=100, mask_thr_binary=0.5)))
