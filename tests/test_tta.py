"""Model-side test-time augmentation (VERDICT r2 Missing #2).

Reference semantics: two_stage.py:268 aug_test + merge_augs.py:13
merge_aug_proposals / :84 merge_aug_bboxes; single-stage
dense_test_mixins.aug_test_bboxes.

Exact invariants (independent of flip-equivariance of the network, which
stride-2 downsampling breaks even in the reference):
* identity TTA (N copies of the same unflipped view) == simple_test;
* a single flipped view == flip-back of simple_test on the flipped image
  (bit-exact coordinate mapping);
* the MultiScaleFlipAug -> StaticBatcher -> run_test path dispatches TTA
  batches through make_aug_test_step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from oadg_tpu.models import build_detector
from oadg_tpu.engine.train_step import make_aug_test_step, make_test_step

HW = 128

MODEL = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=18, base_channels=8, stem_channels=8,
                  out_indices=(0, 1, 2, 3), frozen_stages=-1),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16,
                  anchor_generator=dict(type="AnchorGenerator", scales=[4],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64]),
                  bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                                  target_means=[.0, .0, .0, .0],
                                  target_stds=[1.0, 1.0, 1.0, 1.0])),
    roi_head=dict(type="StandardRoIHead",
                  bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                          featmap_strides=[4, 8, 16, 32]),
                  bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                                 fc_out_channels=32, roi_feat_size=7,
                                 num_classes=8,
                                 bbox_coder=dict(
                                     type="DeltaXYWHBBoxCoder",
                                     target_means=[0., 0., 0., 0.],
                                     target_stds=[0.1, 0.1, 0.2, 0.2]))))
# min_bbox_size=1: a random-init RPN decodes some zero-area boxes clipped
# to the border; their self-IoU is 0 (torch NMS agrees), so identical
# copies from two TTA views would both survive the merge NMS and perturb
# the comparison below. Real configs filter them the same way.
TEST_CFG = dict(rpn=dict(nms_pre=64, max_per_img=32, min_bbox_size=1,
                         nms=dict(iou_threshold=0.7)),
                rcnn=dict(score_thr=0.05, max_per_img=10,
                          nms=dict(iou_threshold=0.5)))


@pytest.fixture(scope="module")
def frcnn_state():
    det = build_detector(MODEL, None, TEST_CFG, num_views=1)
    batch = {"img": jax.random.uniform(jax.random.PRNGKey(0), (1, HW, HW, 3)),
             "img_shape": jnp.asarray([[HW, HW]], jnp.float32),
             "scale_factor": jnp.ones((1, 4), jnp.float32)}
    variables = jax.jit(lambda r, b: det.init(r, b, "test"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    return det, variables, batch


def _dets(d, l, v):
    m = np.asarray(v[0])
    return np.asarray(d[0])[m], np.asarray(l[0])[m]


def test_identity_tta_equals_simple_test(frcnn_state):
    det, variables, tb = frcnn_state
    params, stats = variables["params"], variables.get("batch_stats")
    d0, l0, v0 = make_test_step(det)(params, stats, tb)
    aug = make_aug_test_step(det, ((False, "horizontal"),
                                   (False, "horizontal")))
    d1, l1, v1 = aug(params, stats, (tb, dict(tb)))
    a, la = _dets(d0, l0, v0)
    b, lb = _dets(d1, l1, v1)
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert (la == lb).all()


def test_single_flip_view_maps_back_exactly(frcnn_state):
    det, variables, tb = frcnn_state
    params, stats = variables["params"], variables.get("batch_stats")
    fb = dict(tb, img=tb["img"][:, :, ::-1, :])
    d0, l0, v0 = make_test_step(det)(params, stats, fb)
    a, la = _dets(d0, l0, v0)
    afb = a.copy()
    afb[:, 0] = HW - a[:, 2]
    afb[:, 2] = HW - a[:, 0]
    aug = make_aug_test_step(det, ((True, "horizontal"),))
    d1, l1, v1 = aug(params, stats, (fb,))
    b, lb = _dets(d1, l1, v1)
    o0, o1 = np.lexsort(afb[:, :2].T), np.lexsort(b[:, :2].T)
    assert len(afb) == len(b)
    np.testing.assert_allclose(afb[o0], b[o1], atol=1e-4)
    assert (la[o0] == lb[o1]).all()


def test_single_stage_flip_view_maps_back_exactly():
    model = dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      stem_channels=8, out_indices=(1, 2, 3),
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[16, 32, 64], out_channels=16,
                  start_level=0, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(type="RetinaHead", num_classes=8, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       anchor_generator=dict(
                           type="AnchorGenerator", octave_base_scale=4,
                           scales_per_octave=1, ratios=[1.0],
                           strides=[8, 16, 32, 64, 128]),
                       bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                                       target_means=[.0, .0, .0, .0],
                                       target_stds=[1.0, 1.0, 1.0, 1.0])))
    test_cfg = dict(nms_pre=64, score_thr=0.05, max_per_img=10,
                    nms=dict(iou_threshold=0.5))
    det = build_detector(model, None, test_cfg, num_views=1)
    tb = {"img": jax.random.uniform(jax.random.PRNGKey(3), (1, HW, HW, 3)),
          "img_shape": jnp.asarray([[HW, HW]], jnp.float32),
          "scale_factor": jnp.ones((1, 4), jnp.float32)}
    variables = jax.jit(lambda r, b: det.init(r, b, "test"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        tb)
    params, stats = variables["params"], variables.get("batch_stats")
    fb = dict(tb, img=tb["img"][:, :, ::-1, :])
    d0, l0, v0 = make_test_step(det)(params, stats, fb)
    a, la = _dets(d0, l0, v0)
    afb = a.copy()
    afb[:, 0] = HW - a[:, 2]
    afb[:, 2] = HW - a[:, 0]
    aug = make_aug_test_step(det, ((True, "horizontal"),))
    d1, l1, v1 = aug(params, stats, (fb,))
    b, lb = _dets(d1, l1, v1)
    assert len(afb) == len(b)
    o0, o1 = np.lexsort(afb[:, :2].T), np.lexsort(b[:, :2].T)
    np.testing.assert_allclose(afb[o0], b[o1], atol=1e-4)
    assert (la[o0] == lb[o1]).all()


def test_static_batcher_collates_tta_views():
    from oadg_tpu.data.builder import StaticBatcher
    img_a = np.zeros((64, 64, 3), np.float32)
    img_b = np.zeros((64, 64, 3), np.float32)
    sample = {
        "__tta__": True,
        "img": [img_a, img_b],
        "img_metas": [
            dict(img_shape=(64, 64, 3), scale_factor=[1, 1, 1, 1],
                 flip=False, flip_direction="horizontal"),
            dict(img_shape=(64, 64, 3), scale_factor=[1, 1, 1, 1],
                 flip=True, flip_direction="horizontal")],
    }
    out = StaticBatcher(None)([sample, dict(sample)])
    assert "__tta_views__" in out
    assert out["__tta_metas__"] == ((False, "horizontal"),
                                    (True, "horizontal"))
    assert len(out["__tta_views__"]) == 2
    assert out["__tta_views__"][0]["img"].shape == (2, 64, 64, 3)


def test_run_test_dispatches_tta(frcnn_state):
    from oadg_tpu.apis.test import run_test
    det, variables, tb = frcnn_state
    params, stats = variables["params"], variables.get("batch_stats")
    test_fn = make_test_step(det)
    np_tb = {k: np.asarray(v) for k, v in tb.items()}
    tta_batch = {"__tta_views__": [np_tb, dict(np_tb)],
                 "__tta_metas__": ((False, "horizontal"),
                                   (False, "horizontal")),
                 "metas": [{}]}
    res = run_test(test_fn, params, stats, [tta_batch], 8, detector=det)
    assert len(res) == 1 and len(res[0]) == 8
    plain = run_test(test_fn, params, stats, [np_tb], 8)
    for a, b in zip(res[0], plain[0]):
        np.testing.assert_allclose(a, b, atol=1e-5)
