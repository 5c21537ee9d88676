"""DWD (Diverse Weather Dataset) VOC-XML -> COCO-style json converter
(reference tools/dataset_converters/sdgod.py).

The DWD domains ship in a VOC-style layout (ImageSets/Main/<split>.txt,
Annotations/*.xml, JPEGImages/*.jpg) with the 7 SDGOD classes. Unlike
pascal_voc.py, the reference reads image sizes from the image files
because DWD XMLs frequently carry zeroed <size> fields; this converter
does the same, falling back to the XML when the image is unreadable.
"""
import argparse
import json
import os.path as osp
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from oadg_tpu.data.datasets.xml_style import SdgodDataset


def _image_size(img_path, xml_root):
    try:
        import cv2
        img = cv2.imread(img_path)
        if img is not None:
            return img.shape[1], img.shape[0]
    except ImportError:
        pass
    size = xml_root.find("size")
    return int(size.find("width").text), int(size.find("height").text)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_root", help="domain root with Annotations/, "
                                     "JPEGImages/, ImageSets/Main/")
    p.add_argument("-o", "--out-file", default="sdgod.json")
    p.add_argument("--split", default="train")
    args = p.parse_args()
    ids = [l.strip() for l in open(osp.join(
        args.data_root, "ImageSets", "Main", f"{args.split}.txt"))
        if l.strip()]
    cat_ids = {c: i + 1 for i, c in enumerate(SdgodDataset.CLASSES)}
    images, annotations = [], []
    ann_id = 0
    for img_id, sid in enumerate(ids):
        xml = ET.parse(osp.join(args.data_root, "Annotations",
                                f"{sid}.xml")).getroot()
        file_name = f"JPEGImages/{sid}.jpg"
        w, h = _image_size(osp.join(args.data_root, file_name), xml)
        images.append(dict(id=img_id, file_name=file_name, width=w, height=h))
        for obj in xml.findall("object"):
            name = obj.find("name").text
            if name not in cat_ids:
                continue
            b = obj.find("bndbox")
            # reference stores VOC boxes 0-based (xmin-1); keep that
            x1, y1, x2, y2 = [float(b.find(t).text) - 1 for t in
                              ("xmin", "ymin", "xmax", "ymax")]
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=cat_ids[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1), iscrowd=0))
            ann_id += 1
    with open(args.out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=i, name=c)
                                   for c, i in cat_ids.items()]), f)
    print(f"{args.out_file}: {len(images)} images, {ann_id} annotations")


if __name__ == "__main__":
    main()
