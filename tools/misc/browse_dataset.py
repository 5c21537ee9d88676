"""Visualize pipeline outputs (reference tools/misc/browse_dataset.py)."""
import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config
from oadg_tpu.core.visualization import imshow_det_bboxes
from oadg_tpu.data import build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--output-dir", default="browse_out")
    p.add_argument("--number", type=int, default=10)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    train = dict(cfg.data.train)
    if train.get("type") in ("RepeatDataset", "ClassBalancedDataset"):
        train = dict(train["dataset"])
    # strip normalization for viewable pixels
    train["pipeline"] = [t for t in train["pipeline"]
                         if t["type"] not in ("Normalize", "DefaultFormatBundle",
                                              "Collect")]
    ds = build_dataset(train)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.number, len(ds))):
        s = ds[i]
        img = np.clip(s["img"], 0, 255).astype(np.uint8)
        imshow_det_bboxes(img, s.get("gt_bboxes", np.zeros((0, 4))),
                          s.get("gt_labels", np.zeros((0,), int)),
                          class_names=ds.CLASSES,
                          out_file=osp.join(args.output_dir, f"{i}.png"))
    print(f"wrote {min(args.number, len(ds))} images to {args.output_dir}")


if __name__ == "__main__":
    main()
