"""VOC-XML datasets: XMLDataset, VOCDataset, SdgodDataset (DWD).

Parity with reference mmdet/datasets/xml_style.py:14, voc.py, sdgod.py:12.
SdgodDataset is the Diverse Weather Dataset loader: 7 classes, VOC mAP with
``use_legacy_coordinate=True`` (reference sdgod.py:79-89).
"""
from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import Dict, List

import numpy as np

from ...utils.registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class XMLDataset(CustomDataset):
    def __init__(self, min_size=None, img_subdir="JPEGImages",
                 ann_subdir="Annotations", **kwargs):
        self.img_subdir = img_subdir
        self.ann_subdir = ann_subdir
        self.min_size = min_size
        super().__init__(**kwargs)
        self.cat2label = {cat: i for i, cat in enumerate(self.CLASSES)}

    def load_annotations(self, ann_file):
        self.cat2label = {cat: i for i, cat in enumerate(self.CLASSES)}
        data_infos = []
        with open(ann_file) as f:
            img_ids = [line.strip() for line in f if line.strip()]
        for img_id in img_ids:
            filename = osp.join(self.img_subdir, f"{img_id}.jpg")
            xml_path = osp.join(self.img_prefix, self.ann_subdir,
                                f"{img_id}.xml")
            width = height = 0
            if osp.exists(xml_path):
                root = ET.parse(xml_path).getroot()
                size = root.find("size")
                if size is not None:
                    width = int(size.find("width").text)
                    height = int(size.find("height").text)
            data_infos.append(dict(id=img_id, filename=filename,
                                   width=width, height=height))
        return data_infos

    def get_ann_info(self, idx) -> Dict:
        img_id = self.data_infos[idx]["id"]
        xml_path = osp.join(self.img_prefix, self.ann_subdir, f"{img_id}.xml")
        bboxes, labels, bboxes_ignore, labels_ignore = [], [], [], []
        if osp.exists(xml_path):
            root = ET.parse(xml_path).getroot()
            for obj in root.findall("object"):
                name = obj.find("name").text
                if name not in self.cat2label:
                    continue
                label = self.cat2label[name]
                difficult = obj.find("difficult")
                difficult = 0 if difficult is None else int(difficult.text)
                bnd = obj.find("bndbox")
                bbox = [float(bnd.find(t).text) for t in
                        ("xmin", "ymin", "xmax", "ymax")]
                ignore = False
                if self.min_size:
                    w = bbox[2] - bbox[0]
                    h = bbox[3] - bbox[1]
                    if w < self.min_size or h < self.min_size:
                        ignore = True
                if difficult or ignore:
                    bboxes_ignore.append(bbox)
                    labels_ignore.append(label)
                else:
                    bboxes.append(bbox)
                    labels.append(label)
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(bboxes_ignore, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(labels_ignore, np.int64))

    def _filter_imgs(self, min_size=32):
        valid = []
        for i, info in enumerate(self.data_infos):
            if self.filter_empty_gt and len(self.get_ann_info(i)["bboxes"]) == 0:
                continue
            if info["width"] and min(info["width"], info["height"]) < min_size:
                continue
            valid.append(i)
        return valid


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.year = 2007 if "VOC2007" in self.img_prefix else 2012

    def evaluate(self, results, metric="mAP", logger=None, iou_thr=0.5,
                 **kwargs):
        from ...core.evaluation.mean_ap import eval_map
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        mode = "11points" if self.year == 2007 else "area"
        mean_ap, _ = eval_map(results, annotations, iou_thr=iou_thr,
                              dataset=self.CLASSES, logger=logger, mode=mode,
                              use_legacy_coordinate=True)
        return {"mAP": mean_ap}


@DATASETS.register_module()
class SdgodDataset(XMLDataset):
    """Diverse Weather Dataset (reference mmdet/datasets/sdgod.py:12)."""
    CLASSES = ('bus', 'bike', 'car', 'motor', 'person', 'rider', 'truck')

    def evaluate(self, results, metric="mAP", logger=None, iou_thr=0.5,
                 scale_ranges=None, **kwargs):
        from ...core.evaluation.mean_ap import eval_map
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        mean_ap, per_cls = eval_map(
            results, annotations, scale_ranges=scale_ranges, iou_thr=iou_thr,
            dataset=self.CLASSES, logger=logger,
            use_legacy_coordinate=True)
        out = {"mAP": round(mean_ap, 4)}
        for name, r in zip(self.CLASSES, per_cls):
            out[f"AP_{name}"] = round(r["ap"], 4)
        return out
