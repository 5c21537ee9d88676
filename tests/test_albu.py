"""In-repo Albu subset (data/pipelines/albu.py) vs the mmdet wrapper
contract (reference mmdet/datasets/pipelines/transforms.py:1321) and the
published albumentations op semantics."""
import numpy as np
import pytest

from oadg_tpu.data.pipelines.albu import Albu
from oadg_tpu.utils.registry import PIPELINES, build_from_cfg


def _results(h=64, w=96, n_boxes=2, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    boxes = np.array([[10, 12, 40, 50], [50, 8, 90, 30]],
                     np.float32)[:n_boxes]
    return dict(img=img, gt_bboxes=boxes,
                gt_labels=np.arange(n_boxes, dtype=np.int64),
                img_fields=["img"], bbox_fields=["gt_bboxes"])


REFERENCE_EXAMPLE = [
    dict(type="ShiftScaleRotate", shift_limit=0.0625, scale_limit=0.0,
         rotate_limit=0, interpolation=1, p=0.5),
    dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
         contrast_limit=[0.1, 0.3], p=0.2),
    dict(type="ChannelShuffle", p=0.1),
    dict(type="OneOf", transforms=[
        dict(type="Blur", blur_limit=3, p=1.0),
        dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.1),
]


def test_registered_and_reference_example_builds():
    op = build_from_cfg(dict(
        type="Albu", transforms=REFERENCE_EXAMPLE,
        bbox_params=dict(type="BboxParams", format="pascal_voc",
                         label_fields=["gt_labels"], min_visibility=0.0,
                         filter_lost_elements=True),
        keymap=dict(img="image", gt_bboxes="bboxes"),
        update_pad_shape=False, skip_img_without_anno=True), PIPELINES)
    np.random.seed(3)
    out = op(_results())
    assert out is not None and out["img"].shape == (64, 96, 3)
    assert len(out["gt_bboxes"]) == len(out["gt_labels"])


def test_unknown_op_raises():
    with pytest.raises(NotImplementedError):
        Albu(transforms=[dict(type="ElasticTransformXYZ")])


def test_hflip_bboxes_exact():
    a = Albu(transforms=[dict(type="HorizontalFlip", p=1.0)])
    r = _results()
    out = a(dict(r))
    np.testing.assert_allclose(
        out["gt_bboxes"],
        np.array([[96 - 40, 12, 96 - 10, 50], [96 - 90, 8, 96 - 50, 30]],
                 np.float32))
    assert (out["img"] == r["img"][:, ::-1]).all()


def test_vflip_and_rot90_bbox_roundtrip():
    a = Albu(transforms=[dict(type="VerticalFlip", p=1.0)])
    out = a(_results())
    np.testing.assert_allclose(out["gt_bboxes"][:, 1], [64 - 50, 64 - 30])
    # four quarter rotations must return the original boxes and image
    np.random.seed(0)
    r = _results()
    img0, b0 = r["img"].copy(), r["gt_bboxes"].copy()
    rot = Albu(transforms=[dict(type="RandomRotate90", p=1.0)])
    # force k=1 four times via monkeypatched sample
    from oadg_tpu.data.pipelines import albu as A
    op = A.RandomRotate90(p=1.0)
    img, boxes, h, w = r["img"], r["gt_bboxes"], 64, 96
    for _ in range(4):
        op.k = 1
        img = op.apply(img)
        boxes = op.apply_bboxes(boxes, h, w)
        h, w = w, h
    np.testing.assert_allclose(boxes, b0)
    assert (img == img0).all()
    assert rot is not None


def test_shift_scale_rotate_pure_shift_moves_boxes():
    from oadg_tpu.data.pipelines import albu as A
    op = A.ShiftScaleRotate(shift_limit=0.0, scale_limit=0.0,
                            rotate_limit=0, p=1.0)
    op.sample()
    op.dx, op.dy, op.angle, op.scale = 0.125, 0.0, 0.0, 1.0   # +12px in x
    b = np.array([[10, 12, 40, 50]], np.float32)
    out = op.apply_bboxes(b, 64, 96)
    np.testing.assert_allclose(out, [[22, 12, 52, 50]], atol=1e-4)
    img = _results()["img"]
    moved = op.apply(img)
    # interior pixels shifted right by exactly 12
    assert (moved[:, 20:90] == img[:, 8:78]).all()


def test_brightness_contrast_formula():
    from oadg_tpu.data.pipelines import albu as A
    op = A.RandomBrightnessContrast(p=1.0)
    op.alpha, op.beta = 1.5, 0.1
    img = np.full((4, 4, 3), 100, np.uint8)
    out = op.apply(img)
    assert (out == np.clip(100 * 1.5 + 0.1 * 255, 0, 255).astype(np.uint8)).all()


def test_filter_lost_elements_and_skip():
    # shift every box fully out of the image -> labels filtered; with
    # skip_img_without_anno the op returns None (mmdet skip contract)
    from oadg_tpu.data.pipelines import albu as A
    a = Albu(transforms=[dict(type="ShiftScaleRotate", shift_limit=0.0,
                              scale_limit=0.0, rotate_limit=0, p=1.0)],
             bbox_params=dict(format="pascal_voc",
                              label_fields=["gt_labels"],
                              filter_lost_elements=True),
             skip_img_without_anno=True)
    ssr = a.transforms[0]
    orig_sample = ssr.sample

    def forced():
        orig_sample()
        ssr.dx, ssr.dy = 2.0, 0.0            # 2*w shift: nothing survives
    ssr.sample = forced
    assert a(_results()) is None

    # partial loss keeps label alignment
    a2 = Albu(transforms=[dict(type="HorizontalFlip", p=0.0)],
              bbox_params=dict(format="pascal_voc",
                               label_fields=["gt_labels"],
                               filter_lost_elements=True))
    r = _results()
    r["gt_bboxes"] = np.array([[10, 12, 40, 50], [-30, -20, -5, -2]],
                              np.float32)    # second box fully outside
    out = a2(r)
    assert len(out["gt_bboxes"]) == 1
    np.testing.assert_array_equal(out["gt_labels"], [0])


def test_photometric_ops_run_and_preserve_shape():
    np.random.seed(11)
    ops = [dict(type="RGBShift", p=1.0),
           dict(type="HueSaturationValue", p=1.0),
           dict(type="ToGray", p=1.0),
           dict(type="InvertImg", p=1.0),
           dict(type="JpegCompression", quality_lower=80,
                quality_upper=90, p=1.0),
           dict(type="MedianBlur", blur_limit=5, p=1.0)]
    for cfg in ops:
        a = Albu(transforms=[cfg])
        out = a(_results(seed=5))
        assert out["img"].shape == (64, 96, 3), cfg
        assert out["img"].dtype == np.uint8, cfg


def test_update_pad_shape():
    a = Albu(transforms=[dict(type="HorizontalFlip", p=1.0)],
             update_pad_shape=True)
    out = a(_results())
    assert out["pad_shape"] == out["img"].shape
