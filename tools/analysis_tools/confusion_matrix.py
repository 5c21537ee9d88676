"""Confusion matrix from detection results (reference
tools/analysis_tools/confusion_matrix.py)."""
import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config
from oadg_tpu.core.bbox.geometry import bbox_overlaps_np
from oadg_tpu.data import build_dataset


def calculate_confusion_matrix(dataset, results, score_thr=0.3, iou_thr=0.5):
    n = len(dataset.CLASSES)
    cm = np.zeros((n + 1, n + 1))
    for idx in range(len(dataset)):
        ann = dataset.get_ann_info(idx)
        gts, gt_labels = ann["bboxes"], ann["labels"]
        matched = np.zeros(len(gts), bool)
        for ci, dets in enumerate(results[idx]):
            dets = np.asarray(dets).reshape(-1, 5)
            dets = dets[dets[:, 4] >= score_thr]
            if len(gts) and len(dets):
                ious = bbox_overlaps_np(dets[:, :4], gts)
                for di in range(len(dets)):
                    gi = int(ious[di].argmax())
                    if ious[di, gi] >= iou_thr:
                        cm[gt_labels[gi], ci] += 1
                        matched[gi] = True
                    else:
                        cm[n, ci] += 1       # background -> detection
            else:
                cm[n, ci] += len(dets)
        for gi in np.where(~matched)[0]:
            cm[gt_labels[gi], n] += 1        # missed gt
    return cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("prediction_path")
    p.add_argument("save_dir", nargs="?", default=".")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--tp-iou-thr", type=float, default=0.5)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    tc = dict(cfg.data.test)
    tc["test_mode"] = True
    dataset = build_dataset(tc)
    with open(args.prediction_path, "rb") as f:
        results = pickle.load(f)
    cm = calculate_confusion_matrix(dataset, results, args.score_thr,
                                    args.tp_iou_thr)
    np.save(osp.join(args.save_dir, "confusion_matrix.npy"), cm)
    print(cm.astype(int))


if __name__ == "__main__":
    main()
