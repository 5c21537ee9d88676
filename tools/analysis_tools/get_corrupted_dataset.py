"""Offline corrupted-dataset generator (reference
tools/analysis_tools/get_corrupted_dataset.py): writes
<out>/<corruption>/<severity>/<original relative path> for every test image.
"""
import argparse
import os
import os.path as osp
import sys

import cv2

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config, DictAction
from oadg_tpu.data import build_dataset
from oadg_tpu.ops.corruptions import corrupt_numpy
from test_robustness import CORRUPTION_SETS, resolve_corruptions  # noqa


def main():
    p = argparse.ArgumentParser(description="generate corrupted dataset")
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--corruptions", nargs="+", default=["benchmark"])
    p.add_argument("--severities", nargs="+", type=int, default=[1, 2, 3, 4, 5])
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    args = p.parse_args()

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    tc = dict(cfg.data.test)
    tc["test_mode"] = True
    tc["pipeline"] = [dict(type="LoadImageFromFile")]
    dataset = build_dataset(tc)

    corruptions = resolve_corruptions(args.corruptions)
    for ci, corr in enumerate(corruptions):
        for sev in args.severities:
            for i in range(len(dataset)):
                info = dataset.data_infos[i]
                src = osp.join(dataset.img_prefix, info["filename"])
                img = cv2.imread(src)
                out = corrupt_numpy(img, corr, sev)
                dst = osp.join(args.out, corr, str(sev), info["filename"])
                os.makedirs(osp.dirname(dst), exist_ok=True)
                cv2.imwrite(dst, out)
            print(f"{corr}/{sev}: {len(dataset)} images")


if __name__ == "__main__":
    main()
