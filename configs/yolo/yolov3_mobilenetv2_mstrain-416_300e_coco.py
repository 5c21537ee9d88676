# YOLOv3 MobileNetV2 416 (reference configs/yolo).
_base_ = './yolov3_d53_mstrain-416_273e_coco.py'
model = dict(
    backbone=dict(type='MobileNetV2', out_indices=(2, 4, 6),
                  _delete_=True),
    neck=dict(type='YOLOV3Neck', num_scales=3,
              in_channels=[320, 96, 32], out_channels=[96, 96, 96]),
    bbox_head=dict(in_channels=[96, 96, 96],
                   out_channels=[96, 96, 96]))
runner = dict(type='EpochBasedRunner', max_epochs=300)
