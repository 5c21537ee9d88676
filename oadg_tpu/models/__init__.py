"""Model zoo: backbones, necks, heads, losses, detectors (flax.linen)."""
from . import layers  # noqa: F401
from .backbones import (csp_darknet, darknet, mobilenet_v2,  # noqa: F401
                        regnet, resnet, ssd_vgg, swin)
from .necks import extra_necks, fpn, yolo_neck, yolox_pafpn  # noqa: F401
from .dense_heads import (atss_head, centernet_head, detr_head,  # noqa: F401
                          fcos_head, fovea_fsaf_heads, free_anchor_heads, gfl_head,
                          yolof_head,
                          retina_head, rpn_head, ssd_head, yolo_head,
                          yolox_head)
from .roi_heads import (bbox_heads, cascade_roi_head, mask_heads,  # noqa: F401
                        standard_roi_head)
from .losses import common, oadg  # noqa: F401
from .detectors import single_stage, two_stage  # noqa: F401
from .builder import (build_backbone, build_detector, build_head, build_loss,
                      build_neck)

__all__ = ["build_backbone", "build_detector", "build_head", "build_loss",
           "build_neck"]
