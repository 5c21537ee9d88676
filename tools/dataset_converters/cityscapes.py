"""Cityscapes gtFine polygons -> COCO-style instance json (reference
tools/dataset_converters/cityscapes.py, without cityscapesscripts: the
gtFine *_polygons.json files are parsed directly)."""
import argparse
import glob
import json
import os.path as osp

import numpy as np

CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
           'bicycle')
HAS_INSTANCES = set(CLASSES)


def polygons_to_bbox(poly):
    a = np.asarray(poly, np.float32)
    return [float(a[:, 0].min()), float(a[:, 1].min()),
            float(a[:, 0].max() - a[:, 0].min()),
            float(a[:, 1].max() - a[:, 1].min())]


def convert(gt_dir, img_dir, out_file):
    images, annotations = [], []
    ann_id = 0
    cat_ids = {name: i + 1 for i, name in enumerate(CLASSES)}
    files = sorted(glob.glob(osp.join(gt_dir, "*", "*_polygons.json")))
    for img_id, f in enumerate(files):
        with open(f) as fh:
            gt = json.load(fh)
        city = osp.basename(osp.dirname(f))
        stem = osp.basename(f).replace("_gtFine_polygons.json", "")
        filename = osp.join(city, f"{stem}_leftImg8bit.png")
        images.append(dict(id=img_id, file_name=filename,
                           width=gt["imgWidth"], height=gt["imgHeight"]))
        for obj in gt.get("objects", []):
            label = obj["label"]
            iscrowd = 0
            if label.endswith("group"):
                label = label[:-5]
                iscrowd = 1
            if label not in HAS_INSTANCES:
                continue
            bbox = polygons_to_bbox(obj["polygon"])
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat_ids[label],
                bbox=bbox, area=bbox[2] * bbox[3], iscrowd=iscrowd,
                segmentation=[np.asarray(obj["polygon"], np.float32)
                              .reshape(-1).tolist()]))
            ann_id += 1
    categories = [dict(id=i, name=n) for n, i in cat_ids.items()]
    with open(out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    print(f"{out_file}: {len(images)} images, {len(annotations)} instances")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cityscapes_path", help="root with gtFine/ leftImg8bit/")
    p.add_argument("-o", "--out-dir", default=None)
    args = p.parse_args()
    out_dir = args.out_dir or osp.join(args.cityscapes_path, "annotations")
    import os
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        gt_dir = osp.join(args.cityscapes_path, "gtFine", split)
        if not osp.isdir(gt_dir):
            continue
        convert(gt_dir, osp.join(args.cityscapes_path, "leftImg8bit", split),
                osp.join(out_dir,
                         f"instancesonly_filtered_gtFine_{split}.json"))


if __name__ == "__main__":
    main()
