"""Plot/summarize training log.json (reference
tools/analysis_tools/analyze_logs.py)."""
import argparse
import json

import numpy as np


def load_json_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    pc = sub.add_parser("plot_curve")
    pc.add_argument("json_logs", nargs="+")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--out", default=None)
    ct = sub.add_parser("cal_train_time")
    ct.add_argument("json_logs", nargs="+")
    args = p.parse_args()

    if args.task == "cal_train_time":
        for path in args.json_logs:
            entries = [e for e in load_json_log(path)
                       if e.get("mode") == "train"]
            times = [e["time"] for e in entries if "time" in e]
            print(f"{path}: mean iter time {np.mean(times):.4f}s "
                  f"(std {np.std(times):.4f}, {len(times)} windows)")
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for path in args.json_logs:
        entries = [e for e in load_json_log(path) if e.get("mode") == "train"]
        for key in args.keys:
            xs = [e["iter"] for e in entries if key in e]
            ys = [e[key] for e in entries if key in e]
            plt.plot(xs, ys, label=f"{path}:{key}")
    plt.xlabel("iter")
    plt.legend()
    out = args.out or "curve.png"
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
