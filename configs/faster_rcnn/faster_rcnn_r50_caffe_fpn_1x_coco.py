# Faster R-CNN R50-caffe-FPN 1x COCO (caffe norms, frozen BN).
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(backbone=dict(
    norm_cfg=dict(requires_grad=False), style='caffe'))
img_norm_cfg = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False)
