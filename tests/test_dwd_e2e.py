"""tools/test_dwd.py end to end on a tiny 2-domain VOC-XML fixture
(reference tools/test_dwd.py:196-256 + SdgodDataset/sdgod.py):
XML parsing, VOC-07 legacy-coordinate mAP, per-domain loop, json dump."""
import json
import os
import os.path as osp
import sys
import textwrap

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

SDGOD_CLASSES = ("bus", "bike", "car", "motor", "person", "rider", "truck")


def _write_domain(root, name, n_imgs=2):
    import cv2
    dom = root / name / "VOC2007"
    (dom / "JPEGImages").mkdir(parents=True)
    (dom / "Annotations").mkdir()
    (dom / "ImageSets" / "Main").mkdir(parents=True)
    ids = []
    rng = np.random.RandomState(hash(name) % 2 ** 31)
    for i in range(n_imgs):
        img_id = f"{name}_{i:03d}"
        ids.append(img_id)
        img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
        cv2.imwrite(str(dom / "JPEGImages" / f"{img_id}.jpg"), img)
        cls = SDGOD_CLASSES[i % len(SDGOD_CLASSES)]
        (dom / "Annotations" / f"{img_id}.xml").write_text(textwrap.dedent(f"""
            <annotation>
              <filename>{img_id}.jpg</filename>
              <size><width>96</width><height>64</height><depth>3</depth></size>
              <object>
                <name>{cls}</name>
                <difficult>0</difficult>
                <bndbox><xmin>10</xmin><ymin>12</ymin><xmax>40</xmax><ymax>44</ymax></bndbox>
              </object>
            </annotation>"""))
    (dom / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids))
    return dom


@pytest.mark.slow
def test_sdgod_dataset_and_test_dwd_cli(tmp_path, monkeypatch, capsys):
    domains = ["daytime_clear", "night_sunny"]
    dom_dirs = [_write_domain(tmp_path, d) for d in domains]

    test_list = ", ".join(
        f"dict(type='SdgodDataset', domain='{name}', "
        f"ann_file='{d}/ImageSets/Main/test.txt', "
        f"img_prefix='{d}/', pipeline=test_pipeline)"
        for name, d in zip(domains, dom_dirs))
    cfg_path = tmp_path / "dwd_cfg.py"
    cfg_path.write_text(textwrap.dedent(f"""
        model = dict(
            type='FasterRCNN',
            backbone=dict(type='ResNet', depth=18, base_channels=16,
                          stem_channels=16, out_indices=(0, 1, 2, 3)),
            neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                      out_channels=16, num_outs=5),
            rpn_head=dict(type='RPNHead', in_channels=16, feat_channels=16,
                          anchor_generator=dict(scales=[8],
                                                ratios=[0.5, 1.0, 2.0],
                                                strides=[4, 8, 16, 32, 64])),
            roi_head=dict(
                type='StandardRoIHead',
                bbox_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=0),
                    out_channels=16, featmap_strides=[4, 8, 16, 32]),
                bbox_head=dict(type='Shared2FCBBoxHead', in_channels=16,
                               fc_out_channels=32, num_classes=7)),
            test_cfg=dict(
                rpn=dict(nms_pre=40, max_per_img=20,
                         nms=dict(iou_threshold=0.7)),
                rcnn=dict(score_thr=0.01, nms=dict(iou_threshold=0.5),
                          max_per_img=5)))
        img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                            std=[58.395, 57.12, 57.375], to_rgb=True)
        test_pipeline = [
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(96, 64), flip=False,
                 transforms=[
                     dict(type='Resize', keep_ratio=True),
                     dict(type='RandomFlip'),
                     dict(type='Normalize', **img_norm_cfg),
                     dict(type='Pad', size_divisor=32),
                     dict(type='ImageToTensor', keys=['img']),
                     dict(type='Collect', keys=['img'])])]
        data = dict(
            samples_per_gpu=1, workers_per_gpu=1,
            test=[{test_list}])
    """))

    # dataset-level checks: XML parsing + legacy-coord VOC eval
    from oadg_tpu.utils.registry import DATASETS, build_from_cfg
    from oadg_tpu.config import Config
    cfg = Config.fromfile(str(cfg_path))
    ds = build_from_cfg(dict(cfg.data.test[0]), DATASETS)
    assert len(ds) == 2
    assert ds.CLASSES == SDGOD_CLASSES
    ann = ds.get_ann_info(0)
    np.testing.assert_array_equal(ann["bboxes"],
                                  [[10, 12, 40, 44]])
    # perfect predictions -> mAP 1.0 under VOC07 legacy coords
    perfect = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        per_class = [np.zeros((0, 5), np.float32)
                     for _ in range(len(SDGOD_CLASSES))]
        for box, lab in zip(a["bboxes"], a["labels"]):
            per_class[int(lab)] = np.concatenate(
                [box, [0.9]], 0).astype(np.float32).reshape(1, 5)
        perfect.append(per_class)
    m = ds.evaluate(perfect, metric="mAP")
    assert m["mAP"] == pytest.approx(1.0, abs=1e-3)

    # CLI end to end (random-init model; asserts flow, not accuracy)
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    import test_dwd
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    monkeypatch.setattr(sys, "argv", [
        "test_dwd.py", str(cfg_path), "none", "--out-dir", str(out_dir)])
    test_dwd.main()
    dumped = [p for p in os.listdir(out_dir) if p.endswith(".json")]
    assert dumped
    summary = json.loads((out_dir / dumped[0]).read_text())
    assert set(summary) >= set(domains)
