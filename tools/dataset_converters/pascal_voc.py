"""VOC XML -> COCO-style json (reference
tools/dataset_converters/pascal_voc.py)."""
import argparse
import json
import os.path as osp
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.data.datasets.xml_style import VOCDataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("devkit_path")
    p.add_argument("-o", "--out-file", default="voc.json")
    p.add_argument("--split", default="trainval")
    p.add_argument("--year", default="2007")
    args = p.parse_args()
    root = osp.join(args.devkit_path, f"VOC{args.year}")
    ids = [l.strip() for l in open(osp.join(
        root, "ImageSets", "Main", f"{args.split}.txt")) if l.strip()]
    classes = VOCDataset.CLASSES
    cat_ids = {c: i + 1 for i, c in enumerate(classes)}
    images, annotations = [], []
    ann_id = 0
    for img_id, sid in enumerate(ids):
        xml = ET.parse(osp.join(root, "Annotations", f"{sid}.xml")).getroot()
        size = xml.find("size")
        images.append(dict(id=img_id, file_name=f"JPEGImages/{sid}.jpg",
                           width=int(size.find("width").text),
                           height=int(size.find("height").text)))
        for obj in xml.findall("object"):
            name = obj.find("name").text
            if name not in cat_ids:
                continue
            b = obj.find("bndbox")
            x1, y1, x2, y2 = [float(b.find(t).text) for t in
                              ("xmin", "ymin", "xmax", "ymax")]
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat_ids[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1),
                iscrowd=int(obj.find("difficult") is not None
                            and obj.find("difficult").text == "1")))
            ann_id += 1
    with open(args.out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=i, name=c)
                                   for c, i in cat_ids.items()]), f)
    print(f"{args.out_file}: {len(images)} images")


if __name__ == "__main__":
    main()
