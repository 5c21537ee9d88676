"""Summarize a jax.profiler device trace: top XLA ops by total time.

Usage:
    python tools/analysis_tools/parse_trace.py /tmp/jaxprof [--top 30]

Pairs with ProfilerHook (core/hook/hooks.py) — the TPU-native analog of the
reference's benchmark/profile utilities: instead of wall-clock prints, it
attributes step time to actual fused XLA ops (fusions, whiles, sorts,
convolutions), which is what you optimize on TPU.
"""
import argparse
import collections
import glob
import gzip
import json
import os.path as osp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    paths = sorted(glob.glob(osp.join(
        args.trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no traces under {args.trace_dir}")
    path = paths[-1]
    print(f"trace: {path}")
    with gzip.open(path) as f:
        tr = json.load(f)
    durs = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            # skip host-side python frames
            if name.startswith("$") or "asarray" in name:
                continue
            durs[name] += e["dur"]
    width = max((len(n[:70]) for n, _ in durs.most_common(args.top)),
                default=10)
    print(f"{'op':{width}}  total_ms")
    for n, d in durs.most_common(args.top):
        print(f"{n[:70]:{width}}  {d / 1000:9.2f}")


if __name__ == "__main__":
    main()
