"""Parse a test_robustness text log into the nested results dictionary
(analog of reference tools/analysis_tools/parse_txt2dict.py:94-216).

The reference parses pycocotools' stdout ("Average Precision (AP) @[...").
This framework's ``tools/analysis_tools/test_robustness.py`` prints one
``[<corruption> sev <severity>] {<metrics dict>}`` line per cell, so this
tool parses that format — into the same dictionary contract:

    {
      '<corruption>': {'severity0': {'average_precision': {
            'IoU=0.50:0.95|area=all|maxDets=100': '0.409', ...},
            'average_recall': {...}}, 'severity1': {...}, ...},
      'mPC': {'average_precision': {...}, 'average_recall': {...}},
    }

``get_minimal_dictionary`` flattens it to the reference's key list
(cleanP_*/corr_mPC_*/per-corruption means, parse_txt2dict.py:48-87).

Usage:
    python tools/analysis_tools/parse_txt2dict.py robustness_log.txt
"""
import ast
import re
import sys

AP_KEYMAP = {
    "bbox_mAP": "IoU=0.50:0.95|area=all|maxDets=100",
    "bbox_mAP_50": "IoU=0.50|area=all|maxDets=100",
    "bbox_mAP_75": "IoU=0.75|area=all|maxDets=100",
    "bbox_mAP_s": "IoU=0.50:0.95|area=small|maxDets=100",
    "bbox_mAP_m": "IoU=0.50:0.95|area=medium|maxDets=100",
    "bbox_mAP_l": "IoU=0.50:0.95|area=large|maxDets=100",
}
AR_KEYMAP = {
    "AR@1": "IoU=0.50:0.95|area=all|maxDets=1",
    "AR@10": "IoU=0.50:0.95|area=all|maxDets=10",
    "AR@100": "IoU=0.50:0.95|area=all|maxDets=100",
    "AR_s@100": "IoU=0.50:0.95|area=small|maxDets=100",
    "AR_m@100": "IoU=0.50:0.95|area=medium|maxDets=100",
    "AR_l@100": "IoU=0.50:0.95|area=large|maxDets=100",
}
BENCHMARK = [
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression",
]
LINE_RE = re.compile(r"^\[(\w+) sev (\d+)\] (\{.*\})\s*$")


def _cell(metrics):
    ap = {v: f"{float(metrics[k]):.3f}" for k, v in AP_KEYMAP.items()
          if k in metrics}
    ar = {v: f"{float(metrics[k]):.3f}" for k, v in AR_KEYMAP.items()
          if k in metrics}
    return {"average_precision": ap, "average_recall": ar}


def get_dictionary(file_path):
    dictionary = {}
    with open(file_path) as f:
        for line in f:
            m = LINE_RE.match(line.strip())
            if not m:
                continue
            corr, sev, metrics = m.group(1), int(m.group(2)), \
                ast.literal_eval(m.group(3))
            dictionary.setdefault(corr, {})[f"severity{sev}"] = _cell(metrics)

    # aggregate mPC over benchmark corruptions x severities 1-5
    for section in ("average_precision", "average_recall"):
        acc, count = {}, 0
        for corr in dictionary:
            if corr == "mPC" or corr not in BENCHMARK:
                continue
            for sev in range(1, 6):
                cell = dictionary[corr].get(f"severity{sev}")
                if not cell or not cell[section]:
                    continue
                count += 1
                for k, v in cell[section].items():
                    acc[k] = acc.get(k, 0.0) + float(v)
        if count:
            dictionary.setdefault("mPC", {})[section] = {
                k: f"{v / count:.3f}" for k, v in acc.items()}
    return dictionary


def get_minimal_dictionary(dictionary):
    """Flatten to the reference's minimal key list (values in [0, 1])."""
    keys = (["cleanP_all", "cleanP_small", "cleanP_medium", "cleanP_large",
             "corr_mPC_all", "corr_mPC_small", "corr_mPC_medium",
             "corr_mPC_large"] + BENCHMARK)
    minimal = {k: -1.0 for k in keys}
    for corr, cells in dictionary.items():
        if corr == "mPC":
            for area in ("all", "small", "medium", "large"):
                key = f"IoU=0.50:0.95|area={area}|maxDets=100"
                if key in cells.get("average_precision", {}):
                    minimal[f"corr_mPC_{area}"] = float(
                        cells["average_precision"][key])
            continue
        if "severity0" in cells:
            for area in ("all", "small", "medium", "large"):
                key = f"IoU=0.50:0.95|area={area}|maxDets=100"
                ap = cells["severity0"]["average_precision"]
                if key in ap:
                    minimal[f"cleanP_{area}"] = float(ap[key])
        if corr in BENCHMARK:
            scores = []
            for sev in range(1, 6):
                cell = cells.get(f"severity{sev}")
                ap = (cell or {}).get("average_precision", {})
                scores.append(float(
                    ap.get("IoU=0.50:0.95|area=all|maxDets=100", 0.0)))
            minimal[corr] = sum(scores) / 5.0
    for k, v in minimal.items():
        print("key:", k, " value:", v * 100)
    return minimal


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    d = get_dictionary(sys.argv[1])
    get_minimal_dictionary(d)


if __name__ == "__main__":
    main()
