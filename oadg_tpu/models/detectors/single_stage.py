"""Single-stage detectors (reference mmdet/models/detectors/single_stage.py
+ yolo.py): backbone -> neck -> dense head; OA-DG multi-view batches flow
through unchanged (losses handle view chunking)."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS, build_from_cfg


@DETECTORS.register_module()
class SingleStageDetector(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    num_views: int = 1
    init_cfg: Any = None
    pretrained: Any = None
    dtype: Any = None

    def setup(self):
        bb = dict(self.backbone)
        bb_type = bb.pop("type", "ResNet")
        self.backbone_m = build_from_cfg(dict(type=bb_type, **bb,
                                              dtype=self.dtype), BACKBONES)
        if self.neck is not None:
            nk = dict(self.neck)
            nk_type = nk.pop("type", "FPN")
            self.neck_m = build_from_cfg(dict(type=nk_type, **nk,
                                              dtype=self.dtype), NECKS)
        else:
            self.neck_m = None
        bh = dict(self.bbox_head)
        bh_type = bh.pop("type")
        self.head = build_from_cfg(
            dict(type=bh_type, **bh, train_cfg=self.train_cfg,
                 test_cfg=self.test_cfg, num_views=self.num_views,
                 dtype=self.dtype), HEADS)

    def extract_feat(self, img):
        x = self.backbone_m(img)
        if self.neck_m is not None:
            x = self.neck_m(x)
        return x

    def __call__(self, batch: Dict[str, jnp.ndarray], mode: str = "train"):
        feats = self.extract_feat(batch["img"])
        outs = self.head(feats)
        if mode == "train":
            rng = self.make_rng("sampling")
            if len(outs) == 1:
                return self.head.loss(outs[0], batch["gt_bboxes"],
                                      batch["gt_valid"], batch["gt_labels"],
                                      rng)
            return self.head.loss(outs, batch["gt_bboxes"],
                                  batch["gt_valid"], batch["gt_labels"], rng)
        sf = batch.get("scale_factor",
                       jnp.ones((batch["img"].shape[0], 4), jnp.float32))
        return self.head.get_bboxes(outs, batch["img_shape"], sf)


@DETECTORS.register_module()
class YOLOV3(SingleStageDetector):
    """Alias (reference mmdet/models/detectors/yolo.py:10)."""
    pass


@DETECTORS.register_module()
class RetinaNet(SingleStageDetector):
    """Registered for config compatibility (P2 head pending)."""
    pass
