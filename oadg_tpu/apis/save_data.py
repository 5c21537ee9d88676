"""save_data API (reference mmdet/apis/save_data.py:10-31): write
pipeline-processed images back to disk (de-normalize + PNG), used for
dataset generation and augmentation debugging."""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except ImportError:                                  # pragma: no cover
    cv2 = None


def tensor2imgs(imgs: np.ndarray, mean=(0, 0, 0), std=(1, 1, 1),
                to_rgb: bool = True) -> List[np.ndarray]:
    """(N, H, W, 3) normalized float -> list of uint8 BGR images (the NHWC
    counterpart of mmcv.tensor2imgs)."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = []
    for img in np.asarray(imgs):
        x = img * std + mean
        if to_rgb:
            x = x[..., ::-1]
        out.append(np.clip(x, 0, 255).astype(np.uint8))
    return out


def save_data(batch: Dict, out_dir: str, img_key: str = "img",
              prefix: str = "") -> List[str]:
    """Dump each image of a loader batch as PNG named after its source file."""
    os.makedirs(out_dir, exist_ok=True)
    metas = batch.get("metas", [])
    norm = (metas[0].get("img_norm_cfg", {}) if metas else {})
    imgs = tensor2imgs(batch[img_key], norm.get("mean", (0, 0, 0)),
                       norm.get("std", (1, 1, 1)),
                       norm.get("to_rgb", False))
    paths = []
    for i, img in enumerate(imgs):
        meta = metas[i] if i < len(metas) else {}
        h, w = (int(v) for v in meta.get("img_shape", img.shape)[:2])
        name = osp.basename(meta.get("ori_filename") or f"{prefix}{i}.png")
        path = osp.join(out_dir, name)
        os.makedirs(osp.dirname(path), exist_ok=True)
        cv2.imwrite(path, img[:h, :w])
        paths.append(path)
    return paths
