"""Box geometry: IoU/IoF overlaps in jnp (jit-safe) and numpy (eval path).

Semantics follow the reference's two implementations:
- torch ``BboxOverlaps2D`` (mmdet/core/bbox/iou_calculators/iou2d_calculator.py)
  used inside models: boxes are [x1, y1, x2, y2], widths = x2 - x1.
- numpy ``bbox_overlaps`` (mmdet/core/evaluation/bbox_overlaps.py:5) used by
  OA-Mix and VOC eval: supports ``use_legacy_coordinate`` (+1 widths).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["bbox_overlaps", "bbox_overlaps_np"]


def bbox_overlaps(bboxes1, bboxes2, mode: str = "iou", is_aligned: bool = False,
                  eps: float = 1e-6):
    """Pairwise overlaps between two sets of boxes (jnp, jit-safe).

    Args:
        bboxes1: (..., M, 4) in [x1, y1, x2, y2].
        bboxes2: (..., N, 4).
        mode: 'iou' (intersection over union), 'iof' (over bboxes1 area),
            or 'giou'.
        is_aligned: if True, M must equal N and overlaps are elementwise.

    Returns:
        (..., M, N) or (..., M) if aligned.
    """
    assert mode in ("iou", "iof", "giou")
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])

    if is_aligned:
        lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
        rb = jnp.minimum(bboxes1[..., 2:4], bboxes2[..., 2:4])
        wh = jnp.maximum(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1]
        union = area1 + area2 - overlap if mode != "iof" else area1
        if mode == "giou":
            elt = jnp.minimum(bboxes1[..., :2], bboxes2[..., :2])
            erb = jnp.maximum(bboxes1[..., 2:4], bboxes2[..., 2:4])
    else:
        lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
        rb = jnp.minimum(bboxes1[..., :, None, 2:4], bboxes2[..., None, :, 2:4])
        wh = jnp.maximum(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1]
        if mode == "iof":
            union = area1[..., :, None]
        else:
            union = area1[..., :, None] + area2[..., None, :] - overlap
        if mode == "giou":
            elt = jnp.minimum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
            erb = jnp.maximum(bboxes1[..., :, None, 2:4], bboxes2[..., None, :, 2:4])

    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious
    # GIoU
    ewh = jnp.maximum(erb - elt, 0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
    return ious - (enclose - union) / enclose


def bbox_overlaps_np(bboxes1: np.ndarray, bboxes2: np.ndarray, mode: str = "iou",
                     use_legacy_coordinate: bool = False) -> np.ndarray:
    """numpy overlaps, matching reference core/evaluation/bbox_overlaps.py:5.

    ``use_legacy_coordinate=True`` adds the VOC +1 extra length (used by
    SdgodDataset eval, reference mmdet/datasets/sdgod.py:79-89).
    """
    assert mode in ("iou", "iof")
    extra = 1.0 if use_legacy_coordinate else 0.0
    bboxes1 = bboxes1.astype(np.float32).reshape(-1, 4)
    bboxes2 = bboxes2.astype(np.float32).reshape(-1, 4)
    rows, cols = bboxes1.shape[0], bboxes2.shape[0]
    ious = np.zeros((rows, cols), dtype=np.float32)
    if rows * cols == 0:
        return ious
    exchange = False
    if rows > cols:
        bboxes1, bboxes2 = bboxes2, bboxes1
        ious = np.zeros((cols, rows), dtype=np.float32)
        exchange = True
    area1 = (bboxes1[:, 2] - bboxes1[:, 0] + extra) * (bboxes1[:, 3] - bboxes1[:, 1] + extra)
    area2 = (bboxes2[:, 2] - bboxes2[:, 0] + extra) * (bboxes2[:, 3] - bboxes2[:, 1] + extra)
    for i in range(bboxes1.shape[0]):
        x_start = np.maximum(bboxes1[i, 0], bboxes2[:, 0])
        y_start = np.maximum(bboxes1[i, 1], bboxes2[:, 1])
        x_end = np.minimum(bboxes1[i, 2], bboxes2[:, 2])
        y_end = np.minimum(bboxes1[i, 3], bboxes2[:, 3])
        overlap = np.maximum(x_end - x_start + extra, 0) * np.maximum(y_end - y_start + extra, 0)
        if mode == "iou":
            union = area1[i] + area2 - overlap
        else:
            union = area1[i] if not exchange else area2
        union = np.maximum(union, np.finfo(np.float32).eps)
        ious[i, :] = overlap / union
    if exchange:
        ious = ious.T
    return ious
