"""Tests for the long-tail pipeline transforms (reference
mmdet/datasets/pipelines/transforms.py: RandomShift, SegRescale,
YOLOXHSVRandomAug, UniformNoise, GaussianNoise, RandomCenterCropPad)."""
import numpy as np
import pytest

from oadg_tpu.data.pipelines.transforms import (GaussianNoise,
                                                RandomCenterCropPad,
                                                RandomShift, SegRescale,
                                                UniformNoise,
                                                YOLOXHSVRandomAug)


def _sample(h=64, w=96, n=3, dtype=np.float32):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (h, w, 3)).astype(dtype)
    boxes = np.array([[10, 10, 30, 40], [50, 20, 80, 50], [5, 5, 12, 12]],
                     np.float32)[:n]
    return {
        "img": img,
        "gt_bboxes": boxes,
        "gt_labels": np.arange(n),
        "img_fields": ["img"],
        "bbox_fields": ["gt_bboxes"],
        "img_shape": (h, w, 3),
    }


def test_random_shift_moves_image_and_boxes():
    np.random.seed(3)
    res = _sample()
    orig = res["img"].copy()
    out = RandomShift(shift_ratio=1.0, max_shift_px=8)(dict(res))
    # boxes stay inside the image and labels stay aligned
    b = out["gt_bboxes"]
    assert (b[:, 0::2] >= 0).all() and (b[:, 0::2] <= 96).all()
    assert len(out["gt_labels"]) == len(b)
    # the image content is a translate of the original: some region matches
    assert out["img"].shape == orig.shape
    # zero-filled border exists unless the draw was (0, 0)
    if not np.array_equal(out["img"], orig):
        assert (out["img"] == 0).any()


def test_random_shift_prob_zero_is_identity():
    res = _sample()
    out = RandomShift(shift_ratio=0.0)(dict(res))
    np.testing.assert_array_equal(out["img"], res["img"])
    np.testing.assert_array_equal(out["gt_bboxes"], res["gt_bboxes"])


def test_random_shift_exact_translation():
    np.random.seed(0)
    res = _sample()
    orig = res["img"].copy()
    obox = res["gt_bboxes"].copy()
    out = RandomShift(shift_ratio=1.0, max_shift_px=8)(dict(res))
    # recover the drawn shift from a box that was not clipped
    for i in range(len(obox)):
        if i >= len(out["gt_bboxes"]):
            continue
    # find the shift by matching the interior
    found = False
    for sy in range(-8, 9):
        for sx in range(-8, 9):
            nh, nw = 64 - abs(sy), 96 - abs(sx)
            dy, oy = max(0, sy), max(0, -sy)
            dx, ox = max(0, sx), max(0, -sx)
            if np.array_equal(out["img"][dy:dy + nh, dx:dx + nw],
                              orig[oy:oy + nh, ox:ox + nw]) and \
               np.allclose(out["gt_bboxes"][0],
                           np.clip(obox[0] + [sx, sy, sx, sy],
                                   [0, 0, 0, 0], [96, 64, 96, 64])):
                found = True
    assert found


def test_seg_rescale():
    res = _sample()
    res["gt_semantic_seg"] = np.arange(64 * 96, dtype=np.uint8).reshape(64, 96) % 8
    res["seg_fields"] = ["gt_semantic_seg"]
    out = SegRescale(scale_factor=0.5)(dict(res))
    assert out["gt_semantic_seg"].shape == (32, 48)
    # nearest-neighbour: values come from the original label set
    assert set(np.unique(out["gt_semantic_seg"])) <= set(range(8))
    out1 = SegRescale(scale_factor=1)(dict(res))
    assert out1["gt_semantic_seg"].shape == (64, 96)


def test_yolox_hsv_aug_shape_and_range():
    np.random.seed(1)
    res = _sample(dtype=np.uint8)
    out = YOLOXHSVRandomAug()(dict(res))
    assert out["img"].shape == res["img"].shape
    assert out["img"].dtype == res["img"].dtype
    assert out["img"].min() >= 0 and out["img"].max() <= 255


def test_uniform_noise_bounds():
    np.random.seed(2)
    res = _sample()
    out = UniformNoise(low=0.0, high=0.05)(dict(res))
    d = out["img"] - res["img"]
    assert d.min() >= 0.0 and d.max() <= 0.05 * 255 + 1e-3
    assert out["img"].max() <= 255.0
    # zero-amplitude noise is the identity (up to float round-trip)
    out0 = UniformNoise(low=0.0, high=0.0)(dict(_sample()))
    np.testing.assert_allclose(out0["img"], _sample()["img"], atol=1e-4)


def test_gaussian_noise_prob_gate():
    res = _sample()
    out = GaussianNoise(prob=0.0)(dict(res))
    np.testing.assert_array_equal(out["img"], res["img"])
    np.random.seed(4)
    out = GaussianNoise(scale=0.1, prob=1.0)(dict(res))
    assert not np.array_equal(out["img"], res["img"])
    assert out["img"].min() >= 0 and out["img"].max() <= 255


def test_random_center_crop_pad_train():
    np.random.seed(5)
    res = _sample(h=128, w=160)
    op = RandomCenterCropPad(crop_size=(96, 96), ratios=(1.0,), border=32,
                             mean=[10, 20, 30], std=[1, 1, 1], to_rgb=False)
    out = op(dict(res))
    assert out["img"].shape == (96, 96, 3)
    # kept boxes lie inside the output and labels stay aligned
    b = out["gt_bboxes"]
    assert len(b) >= 1
    assert (b >= 0).all() and (b[:, 0::2] <= 96).all() and \
        (b[:, 1::2] <= 96).all()
    assert len(out["gt_labels"]) == len(b)


def test_random_center_crop_pad_mean_fill():
    np.random.seed(6)
    # tiny image inside a big canvas -> padded area must equal the mean
    res = _sample(h=32, w=32)
    op = RandomCenterCropPad(crop_size=(128, 128), ratios=(1.0,), border=8,
                             mean=[7, 8, 9], std=[1, 1, 1], to_rgb=False)
    out = op(dict(res))
    assert out["img"].shape == (128, 128, 3)
    corner = out["img"][:8, :8]
    np.testing.assert_allclose(
        corner, np.broadcast_to(np.array([7, 8, 9], np.float32), (8, 8, 3)))


def test_random_center_crop_pad_test_mode():
    res = _sample(h=100, w=130)
    op = RandomCenterCropPad(crop_size=None, ratios=None, border=None,
                             mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False,
                             test_mode=True, test_pad_mode=("logical_or", 127))
    out = op(dict(res))
    assert out["img"].shape == ((100 | 127), (130 | 127), 3)
    assert "border" in out
    op2 = RandomCenterCropPad(crop_size=None, ratios=None, border=None,
                              mean=[0, 0, 0], std=[1, 1, 1], to_rgb=False,
                              test_mode=True,
                              test_pad_mode=("size_divisor", 32))
    out2 = op2(dict(res))
    assert out2["img"].shape == (128, 160, 3)
