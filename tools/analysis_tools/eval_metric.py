"""Re-evaluate a result pickle against a dataset (reference
tools/analysis_tools/eval_metric.py)."""
import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.config import Config, DictAction
from oadg_tpu.data import build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("pkl_results")
    p.add_argument("--eval", nargs="+", required=True)
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    tc = dict(cfg.data.test)
    tc["test_mode"] = True
    dataset = build_dataset(tc)
    with open(args.pkl_results, "rb") as f:
        results = pickle.load(f)
    print(dataset.evaluate(results, metric=args.eval))


if __name__ == "__main__":
    main()
