# Faster R-CNN R50-caffe-DC5 1x COCO (stride-1 dilation-2 stage 4,
# single-level RoI path — reference configs/faster_rcnn).
_base_ = [
    '/ws/external/configs/_base_/models/faster_rcnn_r50_caffe_dc5.py',
    '/ws/external/configs/_base_/datasets/coco_detection.py',
    '/ws/external/configs/_base_/schedules/schedule_1x.py',
    '/ws/external/configs/_base_/default_runtime.py',
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=80)))
