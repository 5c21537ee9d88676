"""Unlabeled image dir -> COCO-style json stub (reference
tools/dataset_converters/images2coco.py)."""
import argparse
import glob
import json
import os.path as osp

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img_path")
    p.add_argument("classes", help="text file with one class per line")
    p.add_argument("out", help="output json")
    p.add_argument("--exclude-extensions", nargs="+", default=[])
    args = p.parse_args()
    with open(args.classes) as f:
        classes = [l.strip() for l in f if l.strip()]
    images = []
    for i, path in enumerate(sorted(glob.glob(osp.join(args.img_path, "*")))):
        if any(path.endswith(e) for e in args.exclude_extensions):
            continue
        img = cv2.imread(path)
        if img is None:
            continue
        h, w = img.shape[:2]
        images.append(dict(id=i, file_name=osp.basename(path),
                           width=w, height=h))
    with open(args.out, "w") as f:
        json.dump(dict(images=images, annotations=[],
                       categories=[dict(id=ci + 1, name=c)
                                   for ci, c in enumerate(classes)]), f)
    print(f"{args.out}: {len(images)} images")


if __name__ == "__main__":
    main()
