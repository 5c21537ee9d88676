"""Box format helpers (reference mmdet/core/bbox/transforms.py)."""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def bbox2roi(bbox_list) -> jnp.ndarray:
    """List of per-image (N_i, 4) boxes -> (sum N_i, 5) rois with batch index
    in column 0 (reference core/bbox/transforms.py:75)."""
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        inds = jnp.full((bboxes.shape[0], 1), float(img_id), dtype=bboxes.dtype)
        rois.append(jnp.concatenate([inds, bboxes[:, :4]], axis=-1))
    return jnp.concatenate(rois, axis=0)


def roi2bbox(rois: np.ndarray) -> List[np.ndarray]:
    bbox_list = []
    img_ids = np.unique(rois[:, 0].astype(np.int64))
    for img_id in img_ids:
        bbox_list.append(rois[rois[:, 0] == img_id, 1:])
    return bbox_list


def bbox2result(bboxes: np.ndarray, labels: np.ndarray, num_classes: int) -> List[np.ndarray]:
    """Detections -> per-class list of (n, 5) [x1,y1,x2,y2,score] arrays
    (reference core/bbox/transforms.py bbox2result)."""
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), dtype=np.float32) for _ in range(num_classes)]
    return [bboxes[labels == i, :].astype(np.float32) for i in range(num_classes)]


def bbox_flip(bboxes, img_shape, direction="horizontal"):
    """Flip boxes in [x1,y1,x2,y2] (+ extra dims) within img_shape (h, w)."""
    h, w = img_shape[0], img_shape[1]
    flipped = jnp.array(bboxes) if not isinstance(bboxes, np.ndarray) else bboxes.copy()
    xp = jnp if not isinstance(bboxes, np.ndarray) else np
    out = xp.array(bboxes)
    if direction == "horizontal":
        out = xp.concatenate([w - bboxes[..., 2:3], bboxes[..., 1:2],
                              w - bboxes[..., 0:1], bboxes[..., 3:4]], axis=-1)
    elif direction == "vertical":
        out = xp.concatenate([bboxes[..., 0:1], h - bboxes[..., 3:4],
                              bboxes[..., 2:3], h - bboxes[..., 1:2]], axis=-1)
    else:
        raise ValueError(direction)
    if bboxes.shape[-1] > 4:
        out = xp.concatenate([out, bboxes[..., 4:]], axis=-1)
    return out


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip, flip_direction="horizontal"):
    """Map boxes from the transformed image back to the original
    (reference core/bbox/transforms.py bbox_mapping_back)."""
    new_bboxes = bbox_flip(bboxes, img_shape, flip_direction) if flip else bboxes
    sf = np.asarray(scale_factor, dtype=np.float32).reshape(-1)[:4]
    return new_bboxes[..., :4] / sf


def distance2bbox(points, distance, max_shape=None):
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    bboxes = jnp.stack([x1, y1, x2, y2], -1)
    if max_shape is not None:
        h, w = max_shape[:2]
        bboxes = jnp.stack([
            jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], -1)
    return bboxes


def find_inside_bboxes(bboxes, img_h, img_w):
    """Boxes with any part inside the image (reference core/bbox/transforms.py)."""
    return ((bboxes[..., 0] < img_w) & (bboxes[..., 2] > 0)
            & (bboxes[..., 1] < img_h) & (bboxes[..., 3] > 0))
