"""Integration tests for the tools layer: init/inference_detector,
test-pipeline evaluation, robustness Corrupt insertion — on tiny configs and
synthetic fixtures (CPU)."""
import json
import os
import os.path as osp
import textwrap

import numpy as np
import pytest

import cv2

from oadg_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    (root / "imgs").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        img = rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "imgs" / f"i{i}.png"), img)
        images.append(dict(id=i, file_name=f"i{i}.png", width=96, height=64))
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[10, 10, 30, 25], area=750, iscrowd=0))
    (root / "ann.json").write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name='person'), dict(id=2, name='car')])))

    cfg_path = root / "tiny_cfg.py"
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
                               fc_out_channels=32, num_classes=2)),
            train_cfg=dict(
                rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                       min_pos_iou=0.3),
                         sampler=dict(num=32, pos_fraction=0.5)),
                rpn_proposal=dict(nms_pre=50, max_per_img=20,
                                  nms=dict(iou_threshold=0.7)),
                rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                        min_pos_iou=0.5,
                                        match_low_quality=False),
                          sampler=dict(num=16, pos_fraction=0.25))),
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
            test=dict(type='CocoDataset',
                      ann_file='{root}/ann.json',
                      img_prefix='{root}/imgs',
                      classes=('person', 'car'),
                      pipeline=test_pipeline))
    """))
    return str(cfg_path), str(root)


def test_init_and_inference_detector(tiny_setup):
    cfg_path, root = tiny_setup
    from oadg_tpu.apis import inference_detector, init_detector, \
        show_result_pyplot
    model = init_detector(cfg_path, None)
    result = inference_detector(model, osp.join(root, "imgs", "i0.png"))
    assert len(result) == 2
    for r in result:
        assert r.shape[1] == 5
    out_file = osp.join(root, "vis.png")
    show_result_pyplot(model, osp.join(root, "imgs", "i0.png"), result,
                       score_thr=0.0, out_file=out_file)
    assert osp.exists(out_file)


def test_test_tool_path_and_eval(tiny_setup):
    cfg_path, root = tiny_setup
    import sys
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    from test import build_test_loader, load_model_state
    from oadg_tpu.apis.test import single_gpu_test

    cfg = Config.fromfile(cfg_path)
    dataset, loader = build_test_loader(cfg)
    state = load_model_state(cfg, "none")
    results = single_gpu_test(state, loader)
    assert len(results) == len(dataset)
    metrics = dataset.evaluate(results, metric="bbox")
    assert "bbox_mAP" in metrics


def test_corrupt_insertion_like_robustness_tool(tiny_setup):
    cfg_path, root = tiny_setup
    cfg = Config.fromfile(cfg_path)
    import copy
    test_cfg = copy.deepcopy(dict(cfg.data.test))
    pipeline = list(test_cfg["pipeline"])
    pipeline.insert(1, dict(type="Corrupt", corruption="gaussian_noise",
                            severity=2))
    test_cfg["pipeline"] = pipeline
    test_cfg["test_mode"] = True
    from oadg_tpu.data import build_dataset
    ds = build_dataset(test_cfg)
    s = ds[0]
    assert s["img"].ndim == 3 or isinstance(s["img"], list)


def test_video_demo_end_to_end(tiny_setup, tmp_path, monkeypatch):
    """demo/video_demo.py (reference demo/video_demo.py): synth a 6-frame
    video, run the CLI main, assert an annotated video is written."""
    import subprocess
    import sys as _sys
    cfg_path, root = tiny_setup
    import cv2
    src = str(tmp_path / "in.mp4")
    wtr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 64))
    rng = np.random.RandomState(0)
    for _ in range(6):
        wtr.write(rng.randint(0, 255, (64, 96, 3), np.uint8))
    wtr.release()
    out = str(tmp_path / "out.mp4")

    demo_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "demo")
    _sys.path.insert(0, demo_dir)
    try:
        import video_demo
        monkeypatch.setattr(_sys, "argv",
                            ["video_demo.py", src, cfg_path, "--out", out,
                             "--score-thr", "0.0"])
        video_demo.main()
    finally:
        _sys.path.remove(demo_dir)
    assert osp.exists(out) and osp.getsize(out) > 0
