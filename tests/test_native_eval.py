"""Native eval kernels vs numpy reference parity."""
import numpy as np
import pytest

from oadg_tpu.core.bbox.geometry import bbox_overlaps_np
from oadg_tpu.core.evaluation import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")
RNG = np.random.RandomState(0)


def _boxes(n, w=200, h=150):
    b = np.zeros((n, 4), np.float32)
    b[:, 0] = RNG.uniform(0, w * 0.7, n)
    b[:, 1] = RNG.uniform(0, h * 0.7, n)
    b[:, 2] = b[:, 0] + RNG.uniform(5, w * 0.3, n)
    b[:, 3] = b[:, 1] + RNG.uniform(5, h * 0.3, n)
    return b


@pytest.mark.parametrize("legacy", [False, True])
def test_native_iou_matches_numpy(legacy):
    dets = _boxes(30)
    gts = _boxes(12)
    ours = native.iou_xyxy(dets, gts, use_legacy_coordinate=legacy)
    ref = bbox_overlaps_np(dets, gts, use_legacy_coordinate=legacy)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_native_tpfp_matches_python():
    dets = np.concatenate([_boxes(25), RNG.rand(25, 1).astype(np.float32)], 1)
    gts = _boxes(8)
    gt_ignore = np.zeros(8, bool)
    gt_ignore[5:] = True
    ious = bbox_overlaps_np(dets[:, :4], gts)
    tp_n, fp_n = native.tpfp_greedy(ious, dets[:, 4],
                                    gt_ignore.astype(np.uint8), 0.5)
    # python reference (same algorithm as mean_ap.tpfp_default numpy branch)
    d = len(dets)
    tp = np.zeros(d)
    fp = np.zeros(d)
    ious_max = ious.max(axis=1)
    ious_argmax = ious.argmax(axis=1)
    order = np.argsort(-dets[:, 4], kind="mergesort")
    covered = np.zeros(len(gts), bool)
    for i in order:
        if ious_max[i] >= 0.5:
            gi = ious_argmax[i]
            if gt_ignore[gi]:
                continue
            if not covered[gi]:
                covered[gi] = True
                tp[i] = 1
            else:
                fp[i] = 1
        else:
            fp[i] = 1
    np.testing.assert_array_equal(tp_n, tp)
    np.testing.assert_array_equal(fp_n, fp)


def test_native_coco_match_matches_python():
    from oadg_tpu.core.evaluation.coco_eval import IOU_THRS
    d, g = 20, 7
    ious = RNG.rand(d, g).astype(np.float32)
    gt_ig = np.zeros(g, np.uint8)
    gt_ig[5:] = 1          # ignored last (pycocotools ordering)
    crowd = np.zeros(g, np.uint8)
    crowd[6] = 1
    m_n, ig_n = native.coco_match(ious, gt_ig, crowd,
                                  IOU_THRS.astype(np.float32))
    t = len(IOU_THRS)
    dt_m = np.zeros((t, d), np.int64) - 1
    gt_m = np.zeros((t, g), np.int64) - 1
    dt_ig = np.zeros((t, d), bool)
    for ti, thr in enumerate(IOU_THRS):
        for di in range(d):
            best = min(thr, 1 - 1e-10)
            bg = -1
            for gi in range(g):
                if gt_m[ti, gi] >= 0 and not crowd[gi]:
                    continue
                if bg >= 0 and not gt_ig[bg] and gt_ig[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                bg = gi
            if bg >= 0:
                dt_m[ti, di] = bg
                gt_m[ti, bg] = di
                dt_ig[ti, di] = gt_ig[bg]
    np.testing.assert_array_equal(m_n, dt_m)
    np.testing.assert_array_equal(ig_n.astype(bool), dt_ig)
