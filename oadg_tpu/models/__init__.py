"""Model zoo: backbones, necks, heads, losses, detectors (flax.linen)."""
from . import layers  # noqa: F401
from .backbones import darknet, resnet  # noqa: F401
from .necks import fpn, yolo_neck  # noqa: F401
from .dense_heads import fcos_head, retina_head, rpn_head, yolo_head  # noqa: F401
from .roi_heads import bbox_heads, cascade_roi_head, standard_roi_head  # noqa: F401
from .losses import common, oadg  # noqa: F401
from .detectors import single_stage, two_stage  # noqa: F401
from .builder import (build_backbone, build_detector, build_head, build_loss,
                      build_neck)

__all__ = ["build_backbone", "build_detector", "build_head", "build_loss",
           "build_neck"]
