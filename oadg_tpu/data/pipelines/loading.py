"""Loading pipeline ops (reference mmdet/datasets/pipelines/loading.py).

Host-side, numpy. Only decode + annotation unpacking happen on CPU in this
framework; geometric/photometric augmentation is on-device (SURVEY.md §7).
"""
from __future__ import annotations

import os.path as osp
from typing import Any, Dict

import numpy as np

from ...utils.registry import PIPELINES

try:
    import cv2
except ImportError:                                  # pragma: no cover
    cv2 = None


@PIPELINES.register_module()
class LoadImageFromFile:
    def __init__(self, to_float32: bool = False, color_type: str = "color",
                 channel_order: str = "bgr", file_client_args=None):
        self.to_float32 = to_float32
        self.color_type = color_type
        self.channel_order = channel_order

    def __call__(self, results: Dict[str, Any]):
        if results.get("img_prefix") is not None:
            filename = osp.join(results["img_prefix"],
                                results["img_info"]["filename"])
        else:
            filename = results["img_info"]["filename"]
        img = cv2.imread(filename, cv2.IMREAD_COLOR
                         if self.color_type == "color" else cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(filename)
        if self.channel_order == "rgb":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = filename
        results["ori_filename"] = results["img_info"]["filename"]
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register_module()
class LoadImageFromWebcam(LoadImageFromFile):
    def __call__(self, results):
        img = results["img"]
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = None
        results["ori_filename"] = None
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, with_seg: bool = False,
                 poly2mask: bool = True, file_client_args=None):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_seg = with_seg

    def __call__(self, results: Dict[str, Any]):
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].copy()
            results["bbox_fields"] = ["gt_bboxes"]
            if ann.get("bboxes_ignore") is not None:
                results["gt_bboxes_ignore"] = ann["bboxes_ignore"].copy()
                results["bbox_fields"].append("gt_bboxes_ignore")
        if self.with_label:
            results["gt_labels"] = ann["labels"].copy()
        if self.with_mask:
            results["gt_masks"] = self._load_masks(results, ann)
            results["mask_fields"] = ["gt_masks"]
        return results

    @staticmethod
    def _load_masks(results, ann):
        """COCO polygon / RLE-dict annotation -> box-cropped (N, M0, M0)
        float32 device masks (core/mask/structures.py redesign of the
        reference's BitmapMasks; reference loading.py:412 poly2mask)."""
        from ...core.mask.structures import BitmapMasks, PolygonMasks
        h = results["img_info"].get("height") or results["img"].shape[0]
        w = results["img_info"].get("width") or results["img"].shape[1]
        raw = ann.get("masks") or []
        insts = []
        for m in raw:
            if isinstance(m, dict):          # uncompressed RLE
                flat = np.zeros(h * w, np.uint8)
                counts, pos, val = m.get("counts", []), 0, 0
                for c in counts:
                    flat[pos:pos + c] = val
                    pos += c
                    val = 1 - val
                insts.append(flat.reshape(w, h).T if m.get("size") else
                             flat.reshape(h, w))
            else:                            # polygon list
                insts.append(PolygonMasks([m], h, w).to_bitmap().masks[0])
        bm = BitmapMasks(insts, h, w) if insts else BitmapMasks([], h, w)
        boxes = ann["bboxes"] if len(insts) else np.zeros((0, 4), np.float32)
        return bm.to_box_cropped(boxes, m0=56)
