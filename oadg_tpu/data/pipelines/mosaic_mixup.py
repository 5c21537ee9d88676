"""YOLOX-family host-pipeline ops: Mosaic, MixUp, RandomAffine
(reference mmdet/datasets/pipelines/transforms.py:1948, :2217, :2481) and
the MultiImageMixDataset wrapper (datasets/dataset_wrappers.py:324).

These are CPU data-pipeline ops like the reference's (decode-time numpy);
the device path consumes their fixed-size padded outputs unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

try:
    import cv2
except Exception:                                    # pragma: no cover
    cv2 = None

from ...utils.registry import DATASETS, PIPELINES


@PIPELINES.register_module()
class Mosaic:
    """4-image mosaic: 2x canvas, random center (reference :1948)."""

    def __init__(self, img_scale=(640, 640), center_ratio_range=(0.5, 1.5),
                 min_bbox_size=0, bbox_clip_border=True, pad_val=114,
                 prob=1.0):
        self.img_scale = tuple(img_scale)            # (h, w)
        self.center_ratio_range = center_ratio_range
        self.min_bbox_size = min_bbox_size
        self.bbox_clip_border = bbox_clip_border
        self.pad_val = pad_val
        self.prob = prob

    def __call__(self, results: Dict[str, Any]):
        if "mix_results" not in results or np.random.rand() > self.prob:
            return results
        ih, iw = self.img_scale
        canvas = np.full((ih * 2, iw * 2, 3), self.pad_val, np.uint8)
        cy = int(np.random.uniform(*self.center_ratio_range) * ih)
        cx = int(np.random.uniform(*self.center_ratio_range) * iw)
        samples = [results] + list(results["mix_results"][:3])
        all_boxes, all_labels = [], []
        for i, res in enumerate(samples):
            img = res["img"]
            h, w = img.shape[:2]
            scale = min(ih / h, iw / w)
            nw, nh = int(w * scale), int(h * scale)
            if cv2 is not None:
                img = cv2.resize(img, (nw, nh))
            else:
                yi = (np.arange(nh) * h / nh).astype(int)
                xi = (np.arange(nw) * w / nw).astype(int)
                img = img[yi][:, xi]
            # paste quadrant (tl, tr, bl, br around the center)
            if i == 0:
                x1, y1 = max(cx - nw, 0), max(cy - nh, 0)
                x2, y2 = cx, cy
                sx1, sy1 = nw - (x2 - x1), nh - (y2 - y1)
                sx2, sy2 = nw, nh
            elif i == 1:
                x1, y1 = cx, max(cy - nh, 0)
                x2, y2 = min(cx + nw, iw * 2), cy
                sx1, sy1 = 0, nh - (y2 - y1)
                sx2, sy2 = x2 - x1, nh
            elif i == 2:
                x1, y1 = max(cx - nw, 0), cy
                x2, y2 = cx, min(cy + nh, ih * 2)
                sx1, sy1 = nw - (x2 - x1), 0
                sx2, sy2 = nw, y2 - y1
            else:
                x1, y1 = cx, cy
                x2, y2 = min(cx + nw, iw * 2), min(cy + nh, ih * 2)
                sx1, sy1 = 0, 0
                sx2, sy2 = x2 - x1, y2 - y1
            canvas[y1:y2, x1:x2] = img[sy1:sy2, sx1:sx2]
            boxes = np.asarray(res.get("gt_bboxes",
                                       np.zeros((0, 4), np.float32)),
                               np.float32).copy()
            if boxes.size:
                boxes = boxes * scale
                boxes[:, 0::2] += x1 - sx1
                boxes[:, 1::2] += y1 - sy1
                all_boxes.append(boxes)
                all_labels.append(np.asarray(res.get("gt_labels",
                                                     np.zeros((0,), np.int64))))
        boxes = (np.concatenate(all_boxes) if all_boxes
                 else np.zeros((0, 4), np.float32))
        labels = (np.concatenate(all_labels) if all_labels
                  else np.zeros((0,), np.int64))
        if self.bbox_clip_border and boxes.size:
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, 2 * iw)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, 2 * ih)
        if boxes.size:
            wv = boxes[:, 2] - boxes[:, 0]
            hv = boxes[:, 3] - boxes[:, 1]
            keep = (wv > self.min_bbox_size) & (hv > self.min_bbox_size)
            boxes, labels = boxes[keep], labels[keep]
        results["img"] = canvas
        results["img_shape"] = canvas.shape
        results["gt_bboxes"] = boxes
        results["gt_labels"] = labels
        return results


@PIPELINES.register_module()
class MixUp:
    """2-image mixup on a shared canvas (reference :2217)."""

    def __init__(self, img_scale=(640, 640), ratio_range=(0.5, 1.5),
                 flip_ratio=0.5, pad_val=114, max_iters=15,
                 min_bbox_size=5, bbox_clip_border=True, **kw):
        self.img_scale = tuple(img_scale)
        self.ratio_range = ratio_range
        self.flip_ratio = flip_ratio
        self.pad_val = pad_val
        self.min_bbox_size = min_bbox_size
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, results: Dict[str, Any]):
        if "mix_results" not in results:
            return results
        other = results["mix_results"][0]
        oimg = other["img"].astype(np.float32)
        if np.random.rand() < self.flip_ratio:
            oimg = oimg[:, ::-1]
        h, w = results["img"].shape[:2]
        ratio = np.random.uniform(*self.ratio_range)
        nh, nw = int(oimg.shape[0] * ratio), int(oimg.shape[1] * ratio)
        if cv2 is not None:
            oimg = cv2.resize(oimg, (nw, nh))
        else:
            yi = (np.arange(nh) * oimg.shape[0] / nh).astype(int)
            xi = (np.arange(nw) * oimg.shape[1] / nw).astype(int)
            oimg = oimg[yi][:, xi]
        pad = np.full((max(h, nh), max(w, nw), 3),
                      self.pad_val, np.float32)
        pad[:nh, :nw] = oimg
        pad = pad[:h, :w]
        if pad.shape[0] < h or pad.shape[1] < w:
            tmp = np.full((h, w, 3), self.pad_val, np.float32)
            tmp[:pad.shape[0], :pad.shape[1]] = pad
            pad = tmp
        out = 0.5 * results["img"].astype(np.float32) + 0.5 * pad
        results["img"] = out.astype(results["img"].dtype)
        oboxes = np.asarray(other.get("gt_bboxes",
                                      np.zeros((0, 4), np.float32)),
                            np.float32) * ratio
        if self.bbox_clip_border and oboxes.size:
            oboxes[:, 0::2] = np.clip(oboxes[:, 0::2], 0, w)
            oboxes[:, 1::2] = np.clip(oboxes[:, 1::2], 0, h)
        results["gt_bboxes"] = np.concatenate(
            [results["gt_bboxes"], oboxes]) if oboxes.size else \
            results["gt_bboxes"]
        if oboxes.size:
            results["gt_labels"] = np.concatenate(
                [results["gt_labels"],
                 np.asarray(other.get("gt_labels"))])
        return results


@PIPELINES.register_module()
class RandomAffine:
    """Random rotation/scale/shear/translate warp (reference :2481)."""

    def __init__(self, max_rotate_degree=10.0, max_translate_ratio=0.1,
                 scaling_ratio_range=(0.5, 1.5), max_shear_degree=2.0,
                 border=(0, 0), border_val=(114, 114, 114),
                 min_bbox_size=2, min_area_ratio=0.2,
                 max_aspect_ratio=20, bbox_clip_border=True, **kw):
        self.max_rotate_degree = max_rotate_degree
        self.max_translate_ratio = max_translate_ratio
        self.scaling_ratio_range = scaling_ratio_range
        self.max_shear_degree = max_shear_degree
        self.border = border
        self.border_val = border_val
        self.min_bbox_size = min_bbox_size
        self.min_area_ratio = min_area_ratio
        self.max_aspect_ratio = max_aspect_ratio
        self.bbox_clip_border = bbox_clip_border

    def __call__(self, results: Dict[str, Any]):
        img = results["img"]
        h = img.shape[0] + self.border[0] * 2
        w = img.shape[1] + self.border[1] * 2
        rot = np.random.uniform(-self.max_rotate_degree,
                                self.max_rotate_degree)
        scale = np.random.uniform(*self.scaling_ratio_range)
        sx = np.deg2rad(np.random.uniform(-self.max_shear_degree,
                                          self.max_shear_degree))
        sy = np.deg2rad(np.random.uniform(-self.max_shear_degree,
                                          self.max_shear_degree))
        tx = np.random.uniform(-self.max_translate_ratio,
                               self.max_translate_ratio) * w
        ty = np.random.uniform(-self.max_translate_ratio,
                               self.max_translate_ratio) * h
        a = np.deg2rad(rot)
        R = np.array([[np.cos(a) * scale, -np.sin(a) * scale, 0],
                      [np.sin(a) * scale, np.cos(a) * scale, 0],
                      [0, 0, 1]], np.float32)
        S = np.array([[1, np.tan(sx), 0], [np.tan(sy), 1, 0], [0, 0, 1]],
                     np.float32)
        T = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
        M = (T @ S @ R)[:2]
        if cv2 is not None:
            out = cv2.warpAffine(img, M, (w, h),
                                 borderValue=self.border_val)
        else:                                        # numpy inverse-map
            inv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
            gx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
            gy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
            gxi = np.clip(gx.round().astype(int), 0, img.shape[1] - 1)
            gyi = np.clip(gy.round().astype(int), 0, img.shape[0] - 1)
            out = img[gyi, gxi]
            oob = ((gx < 0) | (gx >= img.shape[1]) | (gy < 0)
                   | (gy >= img.shape[0]))
            out[oob] = self.border_val
        results["img"] = out
        results["img_shape"] = out.shape
        boxes = np.asarray(results.get("gt_bboxes",
                                       np.zeros((0, 4), np.float32)),
                           np.float32)
        if boxes.size:
            corners = np.stack([
                boxes[:, [0, 1]], boxes[:, [2, 1]],
                boxes[:, [0, 3]], boxes[:, [2, 3]]], 1)    # (G,4,2)
            ones = np.ones((*corners.shape[:2], 1), np.float32)
            warped = np.concatenate([corners, ones], -1) @ M.T  # (G,4,2)
            nb = np.concatenate([warped.min(1), warped.max(1)], -1)
            orig_area = ((boxes[:, 2] - boxes[:, 0])
                         * (boxes[:, 3] - boxes[:, 1]))
            if self.bbox_clip_border:
                nb[:, 0::2] = np.clip(nb[:, 0::2], 0, w)
                nb[:, 1::2] = np.clip(nb[:, 1::2], 0, h)
            wv = nb[:, 2] - nb[:, 0]
            hv = nb[:, 3] - nb[:, 1]
            area = wv * hv
            ar = np.maximum(wv / np.maximum(hv, 1e-3),
                            hv / np.maximum(wv, 1e-3))
            keep = ((wv > self.min_bbox_size) & (hv > self.min_bbox_size)
                    & (area / np.maximum(orig_area * scale ** 2, 1e-3)
                       > self.min_area_ratio)
                    & (ar < self.max_aspect_ratio))
            results["gt_bboxes"] = nb[keep]
            results["gt_labels"] = np.asarray(results["gt_labels"])[keep]
        return results


@DATASETS.register_module()
class MultiImageMixDataset:
    """Wrapper feeding Mosaic/MixUp their extra samples (reference
    dataset_wrappers.py:324): re-runs the wrapped dataset's loading for
    randomly drawn indices and stashes them in ``results['mix_results']``."""

    def __init__(self, dataset, pipeline, dynamic_scale=None,
                 skip_type_keys=None, max_refetch=15):
        from ..builder import build_dataset
        from .formatting import Compose
        self.dataset = (dataset if not isinstance(dataset, dict)
                        else build_dataset(dataset))
        self.pipeline_cfg = pipeline
        self.pipeline = Compose(pipeline)
        self.skip_type_keys = set()
        if skip_type_keys:
            self.update_skip_type_keys(skip_type_keys)
        self.CLASSES = getattr(self.dataset, "CLASSES", None)
        if hasattr(self.dataset, "flag"):
            self.flag = self.dataset.flag

    def __len__(self):
        return len(self.dataset)

    def update_skip_type_keys(self, skip_type_keys):
        """Skip the named transform types from now on (reference
        dataset_wrappers.py:382; driven by YOLOXModeSwitchHook)."""
        from .formatting import Compose
        self.skip_type_keys = set(skip_type_keys or [])
        kept = [p for p in (self.pipeline_cfg or [])
                if dict(p).get("type") not in self.skip_type_keys]
        self.pipeline = Compose(kept)

    def __getitem__(self, idx):
        results = self.dataset[idx]
        needs = any(dict(p).get("type") in ("Mosaic", "MixUp")
                    and dict(p).get("type") not in self.skip_type_keys
                    for p in (self.pipeline_cfg or []))
        if needs:
            n = 3
            idxs = np.random.randint(0, len(self.dataset), size=n)
            results["mix_results"] = [self.dataset[i] for i in idxs]
        out = self.pipeline(results)
        out.pop("mix_results", None)
        return out
