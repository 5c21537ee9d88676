"""Visualize best/worst predictions by per-image mAP (reference
tools/analysis_tools/analyze_results.py)."""
import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config
from oadg_tpu.core.evaluation.mean_ap import eval_map
from oadg_tpu.core.visualization import imshow_det_bboxes
from oadg_tpu.data import build_dataset

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("prediction_path")
    p.add_argument("show_dir")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--show-score-thr", type=float, default=0.3)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    tc = dict(cfg.data.test)
    tc["test_mode"] = True
    dataset = build_dataset(tc)
    with open(args.prediction_path, "rb") as f:
        results = pickle.load(f)
    scores = []
    for i in range(len(dataset)):
        ann = dataset.get_ann_info(i)
        m, _ = eval_map([results[i]], [ann], iou_thr=0.5)
        scores.append(m)
    order = np.argsort(scores)
    os.makedirs(osp.join(args.show_dir, "good"), exist_ok=True)
    os.makedirs(osp.join(args.show_dir, "bad"), exist_ok=True)
    for tag, idxs in (("bad", order[:args.topk]),
                      ("good", order[-args.topk:])):
        for i in idxs:
            info = dataset.data_infos[int(i)]
            img = cv2.imread(osp.join(dataset.img_prefix, info["filename"]))
            if img is None:
                continue
            bboxes = np.vstack(results[int(i)])
            labels = np.concatenate([np.full(len(r), ci, np.int32)
                                     for ci, r in enumerate(results[int(i)])])
            imshow_det_bboxes(
                img, bboxes, labels, class_names=dataset.CLASSES,
                score_thr=args.show_score_thr,
                out_file=osp.join(args.show_dir, tag,
                                  f"{scores[int(i)]:.3f}_{osp.basename(info['filename'])}"))
    print(f"wrote top/bottom-{args.topk} to {args.show_dir}")


if __name__ == "__main__":
    main()
