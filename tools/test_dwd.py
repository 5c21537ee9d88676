"""DWD 5-domain evaluation CLI (reference tools/test_dwd.py:196-256):
``cfg.data.test`` is a LIST of SdgodDataset configs; evaluates each domain
with VOC mAP and dumps a json summary."""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from oadg_tpu.config import Config, DictAction


def parse_args():
    p = argparse.ArgumentParser(description="Test on Diverse Weather domains")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--eval", nargs="+", default=["mAP"])
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    p.add_argument("--launcher", default="none")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from test import build_test_loader, load_model_state  # same tools dir
    from oadg_tpu.apis.test import single_gpu_test

    test_cfgs = cfg.data.test
    if isinstance(test_cfgs, dict):
        test_cfgs = [test_cfgs]
    model_state = load_model_state(cfg, args.checkpoint)

    summary = {}
    for dom_cfg in test_cfgs:
        name = dict(dom_cfg).get("domain",
                                 osp.basename(str(dict(dom_cfg).get(
                                     "img_prefix", "domain")).rstrip("/")))
        dataset, loader = build_test_loader(cfg, dom_cfg)
        results = single_gpu_test(model_state, loader)
        metrics = dataset.evaluate(results, metric="mAP")
        summary[name] = metrics
        print(f"\n[{name}] {metrics}")

    maps = [m["mAP"] for m in summary.values()]
    if maps:
        summary["mean_mAP"] = sum(maps) / len(maps)
        print(f"\nmean mAP over {len(maps)} domains: {summary['mean_mAP']:.4f}")
    out = args.out_dir or "."
    with open(osp.join(out, "dwd_results.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
