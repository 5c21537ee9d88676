# Faster R-CNN R50-caffe-C4 1x COCO (reference configs/faster_rcnn).
_base_ = [
    '/ws/external/configs/_base_/models/faster_rcnn_r50_caffe_c4.py',
    '/ws/external/configs/_base_/datasets/coco_detection.py',
    '/ws/external/configs/_base_/schedules/schedule_1x.py',
    '/ws/external/configs/_base_/default_runtime.py',
]
