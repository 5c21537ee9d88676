"""Async inference + feature-analysis apis (reference
mmdet/apis/inference.py:155 async_inference_detector and
mmdet/apis/test.py:49,187 single_gpu_analyze_feature /
single_gpu_test_feature)."""
import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_oadg():
    from __graft_entry__ import _flagship_model_cfg, _train_batch
    from oadg_tpu.models import build_detector
    cfg, model = _flagship_model_cfg(tiny=True)
    det = build_detector(model, num_views=int(cfg.get("num_views", 2)))
    batch = _train_batch(2, 128, 128, g=4)
    variables = jax.jit(lambda r, b: det.init(r, b, "train"))(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, batch)
    nc = int(dict(dict(model["roi_head"])["bbox_head"])["num_classes"])
    state = dict(detector=det, params=variables["params"],
                 batch_stats=variables.get("batch_stats"),
                 num_classes=nc)
    return state, batch


def _gt_loader(batch, n=2):
    return [dict(batch) for _ in range(n)]


def test_single_gpu_test_feature_matrices(tiny_oadg, tmp_path):
    from oadg_tpu.apis import single_gpu_test_feature
    state, batch = tiny_oadg
    out = single_gpu_test_feature(state, _gt_loader(batch),
                                  show_dir=str(tmp_path))
    k = state["num_classes"]
    cm = out["clean_clean_confusion_matrix"]
    cnt = out["clean_clean_matrix_sample_number"]
    assert cm.shape == (k, k) and cnt.shape == (k, k)
    assert np.all(np.abs(cm) <= 1.0 + 1e-5)         # cosine sims
    assert cnt.sum() > 0                            # real pairs counted
    # symmetric by construction in same-set mode
    np.testing.assert_allclose(cnt, cnt.T, atol=1e-6)
    assert (tmp_path / "clean_clean_confusion_matrix.png").exists()
    assert (tmp_path / "clean_clean_matrix_sample_number.npy").exists()


def test_single_gpu_test_feature_cross_domain(tiny_oadg):
    from oadg_tpu.apis import single_gpu_test_feature
    state, batch = tiny_oadg
    out = single_gpu_test_feature(state, _gt_loader(batch, 1),
                                  orig_loader=_gt_loader(batch, 1))
    # identical "domains": cross matrix must equal the same-set matrix up
    # to the self-pair exclusion (diag counts differ by the self pairs)
    ca = out["clean_aug_matrix_sample_number"]
    cc = out["clean_clean_matrix_sample_number"]
    off = ~np.eye(ca.shape[0], dtype=bool)
    np.testing.assert_allclose(ca[off], cc[off], atol=1e-6)
    assert np.all(ca.diagonal() >= cc.diagonal())


def test_single_gpu_analyze_feature_captures(tiny_oadg, tmp_path):
    from oadg_tpu.apis import single_gpu_analyze_feature
    state, batch = tiny_oadg
    test_batch = {
        "img": batch["img"],
        "img_shape": jnp.asarray([[128.0, 128.0]] * batch["img"].shape[0]),
        "scale_factor": jnp.ones((batch["img"].shape[0], 4), jnp.float32),
    }
    flat = single_gpu_analyze_feature(state, [test_batch],
                                      layer_list=("backbone",),
                                      show_dir=str(tmp_path))
    assert flat, "no intermediates captured"
    assert any(a.ndim == 4 for a in flat.values())
    assert list(tmp_path.glob("*.png")), "no heatmaps written"


def test_async_inference_detector(tmp_path):
    import cv2
    import json
    import textwrap
    root = tmp_path
    (root / "imgs").mkdir()
    img = np.random.RandomState(0).randint(0, 255, (64, 96, 3)) \
        .astype(np.uint8)
    cv2.imwrite(str(root / "imgs" / "i0.png"), img)
    cfg_path = root / "cfg.py"
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
        data = dict(test=dict(type='CocoDataset', ann_file='',
                              img_prefix='', classes=('person', 'car'),
                              pipeline=test_pipeline))
    """))
    from oadg_tpu.apis import (async_inference_detector, inference_detector,
                               init_detector)
    model = init_detector(str(cfg_path), None)
    img_path = str(root / "imgs" / "i0.png")
    got = asyncio.run(async_inference_detector(model, img_path))
    want = inference_detector(model, img_path)
    assert len(got) == len(want) == 2                # per-class lists
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    # list input -> list output, same content per image
    got2 = asyncio.run(async_inference_detector(model,
                                                [img_path, img_path]))
    assert len(got2) == 2
    for g, w in zip(got2[1], want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
