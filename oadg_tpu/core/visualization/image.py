"""Detection visualization (reference mmdet/core/visualization/image.py
imshow_det_bboxes) — cv2-based drawing, no matplotlib dependency needed at
runtime."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:                                  # pragma: no cover
    cv2 = None

_PALETTE = [(220, 20, 60), (119, 172, 48), (0, 114, 189), (237, 177, 32),
            (126, 47, 142), (217, 83, 25), (77, 190, 238), (162, 20, 47)]


def imshow_det_bboxes(img: np.ndarray, bboxes: np.ndarray,
                      labels: np.ndarray,
                      class_names: Optional[Sequence[str]] = None,
                      score_thr: float = 0.0, thickness: int = 2,
                      font_scale: float = 0.5, show: bool = False,
                      win_name: str = "", wait_time: int = 0,
                      out_file: Optional[str] = None) -> np.ndarray:
    """Draw detections on an image; returns the drawn image (BGR)."""
    img = np.ascontiguousarray(img.copy())
    if bboxes.shape[1] == 5 and score_thr > 0:
        keep = bboxes[:, 4] >= score_thr
        bboxes = bboxes[keep]
        labels = labels[keep]
    for box, label in zip(bboxes, labels):
        x1, y1, x2, y2 = box[:4].astype(int)
        color = _PALETTE[int(label) % len(_PALETTE)]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = (class_names[int(label)] if class_names is not None
                and int(label) < len(class_names) else f"cls{int(label)}")
        text = name + (f"|{box[4]:.2f}" if len(box) > 4 else "")
        cv2.putText(img, text, (x1, max(y1 - 4, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1,
                    cv2.LINE_AA)
    if out_file:
        cv2.imwrite(out_file, img)
    return img
