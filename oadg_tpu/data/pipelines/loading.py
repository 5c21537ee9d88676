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


@PIPELINES.register_module()
class LoadProposals:
    """Load precomputed proposals (reference pipelines/loading.py:512)."""

    def __init__(self, num_max_proposals=None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results):
        proposals = np.asarray(results["proposals"], np.float32)
        if proposals.shape[1] not in (4, 5):
            raise AssertionError(
                "proposals should have shapes (n, 4) or (n, 5), "
                f"but found {proposals.shape}")
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[: self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.array([[0, 0, 0, 0]], dtype=np.float32)
        results["proposals"] = proposals
        results.setdefault("bbox_fields", []).append("proposals")
        return results


@PIPELINES.register_module()
class FilterAnnotations:
    """Drop gt boxes below a minimum size (reference loading.py:557);
    returns None (sample re-drawn by the loader) when nothing survives
    and keep_empty is set."""

    def __init__(self, min_gt_bbox_wh, keep_empty=True):
        self.min_gt_bbox_wh = tuple(min_gt_bbox_wh)
        self.keep_empty = keep_empty

    def __call__(self, results):
        gt_bboxes = results["gt_bboxes"]
        if gt_bboxes.shape[0] == 0:
            return results
        w = gt_bboxes[:, 2] - gt_bboxes[:, 0]
        h = gt_bboxes[:, 3] - gt_bboxes[:, 1]
        keep = (w > self.min_gt_bbox_wh[0]) & (h > self.min_gt_bbox_wh[1])
        if not keep.any():
            return None if self.keep_empty else results
        for key in ("gt_bboxes", "gt_labels", "gt_masks", "gt_semantic_seg"):
            if key in results and hasattr(results[key], "__getitem__"):
                try:
                    results[key] = results[key][keep]
                except (TypeError, IndexError):
                    pass
        return results


@PIPELINES.register_module()
class LoadMultiChannelImageFromFiles:
    """Stack a list of single-channel image files along the channel axis
    (reference loading.py:131)."""

    def __init__(self, to_float32=False, color_type="unchanged", **kw):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        import os.path as osp

        import cv2
        prefix = results.get("img_prefix")
        names = results["img_info"]["filename"]
        paths = [osp.join(prefix, n) if prefix else n for n in names]
        flag = (cv2.IMREAD_UNCHANGED if self.color_type == "unchanged"
                else cv2.IMREAD_COLOR)
        img = np.stack([cv2.imread(p, flag) for p in paths], axis=-1)
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = paths
        results["ori_filename"] = names
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        return results


@PIPELINES.register_module()
class LoadPanopticAnnotations:
    """Load COCO-panoptic annotations (reference loading.py
    LoadPanopticAnnotations): decode the panoptic PNG id map
    (id = R + 256 G + 65536 B), emit thing-instance binary masks as
    ``gt_masks`` plus a ``gt_semantic_seg`` label map covering stuff AND
    thing segments (255 = void), alongside the usual boxes/labels the
    dataset's get_ann_info provides."""

    def __init__(self, with_bbox=True, with_mask=True, with_seg=True,
                 **kw):
        self.with_bbox = with_bbox
        self.with_mask = with_mask
        self.with_seg = with_seg

    def __call__(self, results):
        from ...core.evaluation.panoptic_eval import rgb2id
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"]
            results["gt_labels"] = ann["labels"]
            results.setdefault("bbox_fields", []).append("gt_bboxes")
        seg_map = ann.get("seg_map")
        prefix = results.get("seg_prefix")
        path = osp.join(prefix, seg_map) if prefix else seg_map
        png = cv2.imread(path, cv2.IMREAD_COLOR)
        id_map = rgb2id(png[..., ::-1])
        if self.with_mask:
            masks = [(id_map == sid).astype(np.uint8)
                     for sid, thing in zip(ann["all_seg_ids"],
                                           ann["seg_isthing"]) if thing]
            results["gt_masks"] = np.stack(masks) if masks else \
                np.zeros((0,) + id_map.shape, np.uint8)
            results.setdefault("mask_fields", []).append("gt_masks")
        if self.with_seg:
            sem = np.full(id_map.shape, 255, np.uint8)
            for sid, lbl in zip(ann["all_seg_ids"], ann["seg_labels"]):
                sem[id_map == sid] = lbl
            results["gt_semantic_seg"] = sem
            results.setdefault("seg_fields", []).append("gt_semantic_seg")
        return results
