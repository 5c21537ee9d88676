"""K-means anchor optimization for YOLO-style priors (reference
tools/analysis_tools/optimize_anchors.py)."""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config
from oadg_tpu.data import build_dataset


def iou_wh(whs, centers):
    inter = (np.minimum(whs[:, None, 0], centers[None, :, 0])
             * np.minimum(whs[:, None, 1], centers[None, :, 1]))
    union = (whs[:, 0] * whs[:, 1])[:, None] + \
        (centers[:, 0] * centers[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def kmeans_anchors(whs, k, iters=1000, seed=0):
    rng = np.random.RandomState(seed)
    centers = whs[rng.choice(len(whs), k, replace=False)]
    for _ in range(iters):
        assign = iou_wh(whs, centers).argmax(1)
        new = np.stack([whs[assign == i].mean(0) if (assign == i).any()
                        else centers[i] for i in range(k)])
        if np.allclose(new, centers, atol=1e-3):
            break
        centers = new
    return centers[np.argsort(centers.prod(1))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--num-anchors", type=int, default=9)
    p.add_argument("--input-shape", type=int, nargs=2, default=[1024, 1024])
    p.add_argument("--algorithm", default="k-means")
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    train = dict(cfg.data.train)
    while train.get("type") in ("RepeatDataset", "ClassBalancedDataset"):
        train = dict(train["dataset"])
    train["pipeline"] = [t for t in train["pipeline"]
                         if t["type"] in ("LoadImageFromFile",
                                          "LoadAnnotations")]
    ds = build_dataset(train)
    whs = []
    for i in range(len(ds)):
        info = ds.data_infos[i]
        ann = ds.get_ann_info(i)
        sw = args.input_shape[1] / info["width"]
        sh = args.input_shape[0] / info["height"]
        b = ann["bboxes"]
        whs.append(np.stack([(b[:, 2] - b[:, 0]) * sw,
                             (b[:, 3] - b[:, 1]) * sh], 1))
    whs = np.concatenate(whs)
    anchors = kmeans_anchors(whs, args.num_anchors)
    mean_iou = iou_wh(whs, anchors).max(1).mean()
    print(f"anchors (w, h) for input {args.input_shape}: ")
    for a in anchors:
        print(f"  ({a[0]:.0f}, {a[1]:.0f})")
    print(f"mean best-IoU: {mean_iou:.4f}")


if __name__ == "__main__":
    main()
