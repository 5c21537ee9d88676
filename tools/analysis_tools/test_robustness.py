"""Corruption robustness benchmark (reference
tools/analysis_tools/test_robustness.py:189-429): for each
(corruption, severity) cell, rebuild the test dataset with a Corrupt op at
pipeline position 1, run inference, evaluate, aggregate to a pickle, and
print P/mPC/rPC."""
import argparse
import copy
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config, DictAction
from oadg_tpu.ops.corruptions import (BENCHMARK_CORRUPTIONS, CORRUPTIONS,
                                      HOLDOUT_CORRUPTIONS)

CORRUPTION_SETS = {
    "benchmark": BENCHMARK_CORRUPTIONS,
    "all": list(CORRUPTIONS),
    "holdout": HOLDOUT_CORRUPTIONS,
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
    "weather": ["snow", "frost", "fog", "brightness"],
    "digital": ["contrast", "elastic_transform", "pixelate",
                "jpeg_compression"],
}


def parse_args():
    p = argparse.ArgumentParser(description="corruption robustness benchmark")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--corruptions", nargs="+", default=["benchmark"])
    p.add_argument("--severities", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--out", default="robustness_results.pkl")
    p.add_argument("--eval", nargs="+", default=["bbox"])
    p.add_argument("--load-dataset", default=None, choices=[None, "corrupted"],
                   help="'corrupted': remap img_prefix to a pre-generated "
                        "<root>-c/<corruption>/<severity>/ tree")
    p.add_argument("--corrupted-root", default=None)
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    p.add_argument("--launcher", default="none")
    return p.parse_args()


def resolve_corruptions(names):
    out = []
    for n in names:
        out.extend(CORRUPTION_SETS.get(n, [n]))
    seen = set()
    return [c for c in out if not (c in seen or seen.add(c))]


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
    from test import build_test_loader, load_model_state
    from oadg_tpu.apis.test import single_gpu_test

    corruptions = resolve_corruptions(args.corruptions)
    model_state = load_model_state(cfg, args.checkpoint)
    aggregated = {}
    clean_cell = None

    for corr in corruptions:
        aggregated.setdefault(corr, {})
        for severity in args.severities:
            if severity == 0 and clean_cell is not None:
                aggregated[corr][0] = clean_cell       # evaluated once (:262)
                continue
            test_cfg = copy.deepcopy(dict(cfg.data.test))
            if severity > 0:
                if args.load_dataset == "corrupted":
                    root = args.corrupted_root or (
                        str(test_cfg["img_prefix"]).rstrip("/") + "-c")
                    test_cfg["img_prefix"] = osp.join(root, corr,
                                                      str(severity))
                else:
                    pipeline = list(test_cfg["pipeline"])
                    pipeline.insert(1, dict(type="Corrupt", corruption=corr,
                                            severity=severity))
                    test_cfg["pipeline"] = pipeline
            dataset, loader = build_test_loader(cfg, test_cfg)
            results = single_gpu_test(model_state, loader)
            metrics = dataset.evaluate(results, metric=args.eval)
            metrics = {k: float(v) for k, v in metrics.items()
                       if isinstance(v, (int, float))}
            aggregated[corr][severity] = metrics
            if severity == 0:
                clean_cell = metrics
            print(f"\n[{corr} sev {severity}] {metrics}")
            with open(args.out, "wb") as f:
                pickle.dump(aggregated, f)

    from robustness_eval import get_results
    get_results(args.out, dataset="coco",
                metric="bbox_mAP" if "bbox" in args.eval else "mAP")


if __name__ == "__main__":
    main()
