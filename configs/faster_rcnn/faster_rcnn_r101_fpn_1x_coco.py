# Faster R-CNN R101-FPN 1x COCO.
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(backbone=dict(depth=101))
