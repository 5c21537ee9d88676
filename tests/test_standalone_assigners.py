"""Standalone functional assigners (round-1 verdict: these were
config-surface stubs). Fixtures verify the reference selection rules:
task_aligned_assigner.py / uniform_assigner.py / point_assigner.py /
sim_ota_assigner.py."""
import numpy as np
import pytest

import jax.numpy as jnp

from oadg_tpu.core.bbox.assign_sample import (PointAssigner, RegionAssigner,
                                              SimOTAAssigner,
                                              TaskAlignedAssigner,
                                              UniformAssigner)


def _grid_anchors(step=8, n=8, size=8.0):
    xs, ys = np.meshgrid(np.arange(n) * step + step / 2,
                         np.arange(n) * step + step / 2)
    c = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    return np.concatenate([c - size / 2, c + size / 2], -1)


def test_task_aligned_assigner_selects_aligned_anchors():
    anchors = _grid_anchors()                       # 64 anchors, 8x8 grid
    n = anchors.shape[0]
    gt = np.array([[10, 10, 30, 30], [0, 0, 0, 0]], np.float32)
    gt_valid = np.array([True, False])
    gt_labels = np.array([1, 0], np.int32)
    # decoded boxes: anchors jittered toward the gt for the inside anchors
    decode = anchors.copy()
    scores = np.full((n, 3), 0.1, np.float32)
    # anchor 9 (center 12.5+8k...) compute centers inside gt
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    inside = (cx > 10) & (cx < 30) & (cy > 10) & (cy < 30)
    decode[inside] = [10, 10, 30, 30]               # perfect boxes inside
    scores[inside, 1] = 0.9
    a = TaskAlignedAssigner(topk=4)
    res, metrics = a.assign(jnp.asarray(scores), jnp.asarray(decode),
                            jnp.asarray(anchors), jnp.asarray(gt),
                            jnp.asarray(gt_valid), jnp.asarray(gt_labels))
    assigned = np.asarray(res.gt_inds)
    # only inside-gt anchors can be positive, and at most topk of them
    assert (assigned[~inside] == 0).all()
    npos = (assigned == 1).sum()
    assert 1 <= npos <= 4
    assert (np.asarray(res.labels)[assigned == 1] == 1).all()
    assert (np.asarray(metrics)[assigned == 1] > 0).all()
    # invalid gt never assigned
    assert (assigned <= 1).all()


def test_uniform_assigner_matches_nearest_and_ignores():
    anchors = _grid_anchors(step=16, n=4, size=16.0)   # 16 anchors
    gt = np.array([[14, 14, 34, 34]], np.float32)      # near anchor (24,24)?
    gt_valid = np.array([True])
    gt_labels = np.array([2], np.int32)
    preds = anchors.copy()
    a = UniformAssigner(match_times=2, pos_ignore_thr=0.1, neg_ignore_thr=0.7)
    res = a.assign(jnp.asarray(preds), jnp.asarray(anchors), jnp.asarray(gt),
                   jnp.asarray(gt_valid), jnp.asarray(gt_labels))
    assigned = np.asarray(res.gt_inds)
    assert (assigned == 1).sum() >= 1
    # positives are among the nearest anchors by center distance
    cxcy = (anchors[:, :2] + anchors[:, 2:]) / 2
    d = np.abs(cxcy - [24, 24]).sum(1)
    nearest = set(np.argsort(d)[:2].tolist())
    assert set(np.nonzero(assigned == 1)[0].tolist()) <= nearest
    assert (np.asarray(res.labels)[assigned == 1] == 2).all()


def test_uniform_assigner_neg_ignore():
    anchors = _grid_anchors(step=32, n=2, size=16.0)
    gt = np.array([[0, 0, 20, 20]], np.float32)
    preds = anchors.copy()
    preds[3] = [1, 1, 21, 21]          # far anchor predicting onto the gt
    a = UniformAssigner(match_times=1, pos_ignore_thr=0.0, neg_ignore_thr=0.7)
    res = a.assign(jnp.asarray(preds), jnp.asarray(anchors), jnp.asarray(gt),
                   jnp.ones(1, bool), jnp.zeros(1, jnp.int32))
    assigned = np.asarray(res.gt_inds)
    # anchor 3 is not a candidate (far anchor) but its pred overlaps the gt
    # strongly -> ignored, unless it was selected as pred-candidate; the
    # pred top-1 IS anchor 3 (perfect box), so it becomes positive instead.
    assert assigned[3] in (1, -1)


def test_point_assigner_level_and_distance():
    # points on two levels: stride 8 and 16
    pts = []
    for stride, n in ((8, 8), (16, 4)):
        xs, ys = np.meshgrid(np.arange(n) * stride + stride / 2,
                             np.arange(n) * stride + stride / 2)
        pts.append(np.stack([xs.ravel(), ys.ravel(),
                             np.full(n * n, stride)], -1))
    pts = np.concatenate(pts).astype(np.float32)
    # gt sized so lvl = log2(sqrt(w*h)/scale) = log2(32/4) = 3 -> stride 8
    gt = np.array([[16, 16, 48, 48]], np.float32)
    a = PointAssigner(scale=4, pos_num=3)
    res = a.assign(jnp.asarray(pts), jnp.asarray(gt), jnp.ones(1, bool),
                   jnp.asarray([1], jnp.int32))
    assigned = np.asarray(res.gt_inds)
    pos = np.nonzero(assigned == 1)[0]
    assert len(pos) == 3
    assert (pts[pos, 2] == 8).all()            # all on the matched level
    # they are among the closest stride-8 points to the gt center (32, 32)
    # (4 points tie at the minimum distance; any 3 of them are valid)
    lvl8 = pts[pts[:, 2] == 8]
    d = np.linalg.norm(lvl8[:, :2] - [32, 32], axis=1)
    kth = np.sort(d)[2]
    closest = set(np.nonzero(d <= kth + 1e-5)[0].tolist())
    assert set(pos.tolist()) <= closest


def test_simota_assigner_positive_count_and_location():
    n = 16
    xs, ys = np.meshgrid(np.arange(n) * 8 + 4, np.arange(n) * 8 + 4)
    priors = np.stack([xs.ravel(), ys.ravel(),
                       np.full(n * n, 8.0), np.full(n * n, 8.0)],
                      -1).astype(np.float32)
    gt = np.array([[24, 24, 72, 72]], np.float32)
    decoded = np.tile(np.array([[26, 25, 70, 73]], np.float32),
                      (n * n, 1))             # all predict near the gt
    scores = np.full((n * n, 2), 0.5, np.float32)
    a = SimOTAAssigner()
    res = a.assign(jnp.asarray(scores), jnp.asarray(priors),
                   jnp.asarray(decoded), jnp.asarray(gt),
                   jnp.ones(1, bool), jnp.asarray([0], jnp.int32))
    assigned = np.asarray(res.gt_inds)
    pos = np.nonzero(assigned == 1)[0]
    assert len(pos) >= 1
    # dynamic k = clip(sum of top-10 ious) -> all ious equal ~0.87 => k=8
    assert len(pos) <= 10
    # positives lie inside the gt box
    assert ((priors[pos, 0] > 24) & (priors[pos, 0] < 72)).all()
    assert ((priors[pos, 1] > 24) & (priors[pos, 1] < 72)).all()


def _region_assign_reference(mlvl_anchors, gt_bboxes, featmap_sizes,
                             anchor_scale, anchor_strides, img_shape,
                             center_ratio=0.2, ignore_ratio=0.5,
                             allowed_border=0):
    """Literal numpy port of reference region_assigner.py:58 (the
    sequential per-gt loop, ordered overwrites and all)."""
    def calc_region(bbox, ratio, stride, fs):
        f = bbox / stride
        x1 = np.clip(np.round((1 - ratio) * f[0] + ratio * f[2]), 0, fs[1])
        y1 = np.clip(np.round((1 - ratio) * f[1] + ratio * f[3]), 0, fs[0])
        x2 = np.clip(np.round(ratio * f[0] + (1 - ratio) * f[2]), 0, fs[1])
        y2 = np.clip(np.round(ratio * f[1] + (1 - ratio) * f[3]), 0, fs[0])
        return x1, y1, x2, y2

    def inside(anchors, stride, region):
        x1, y1, x2, y2 = region
        f = anchors / stride
        x = (f[:, 0] + f[:, 2]) / 2
        y = (f[:, 1] + f[:, 3]) / 2
        return (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)

    num_lvls = len(mlvl_anchors)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = np.sqrt((gt_bboxes[:, 2] - gt_bboxes[:, 0])
                    * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
    min_sz = anchor_scale * anchor_strides[0]
    tgt = np.clip(np.floor(np.log2(scale) - np.log2(min_sz) + 0.5),
                  0, num_lvls - 1).astype(int)
    assigned = [np.zeros(a.shape[0], np.int64) for a in mlvl_anchors]
    adj = [np.zeros(a.shape[0], bool) for a in mlvl_anchors]
    for gi in range(len(gt_bboxes)):
        lvl = tgt[gi]
        box = gt_bboxes[gi]
        s, fs, a = anchor_strides[lvl], featmap_sizes[lvl], mlvl_anchors[lvl]
        assigned[lvl][inside(a, s, calc_region(box, r2, s, fs))] = -1
        assigned[lvl][inside(a, s, calc_region(box, r1, s, fs))] = gi + 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < num_lvls:
                ds, dfs, da = (anchor_strides[d], featmap_sizes[d],
                               mlvl_anchors[d])
                adj[d] |= inside(da, ds, calc_region(box, r2, ds, dfs))
    flat = np.concatenate(assigned)
    flat[np.concatenate(adj)] = -1
    fa = np.concatenate(mlvl_anchors)
    out = ((fa[:, 0] < -allowed_border) | (fa[:, 1] < -allowed_border)
           | (fa[:, 2] >= img_shape[1] + allowed_border)
           | (fa[:, 3] >= img_shape[0] + allowed_border))
    flat[out] = -1
    return flat


def test_region_assigner_matches_reference_port():
    rng = np.random.RandomState(3)
    strides = (8, 16, 32)
    featmap_sizes = [(16, 16), (8, 8), (4, 4)]
    mlvl_anchors = []
    for s, (fh, fw) in zip(strides, featmap_sizes):
        xs, ys = np.meshgrid(np.arange(fw) * s + s / 2,
                             np.arange(fh) * s + s / 2)
        c = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        mlvl_anchors.append(np.concatenate([c - 2 * s, c + 2 * s], -1))
    # gts across scales, incl. overlapping ones (order-dependent overwrite)
    gt = np.array([[10, 10, 60, 56], [16, 12, 50, 60],
                   [4, 4, 120, 120], [70, 70, 100, 92]], np.float32)
    labels = np.array([2, 0, 1, 3], np.int32)
    want = _region_assign_reference(mlvl_anchors, gt, featmap_sizes, 4,
                                    strides, img_shape=(128, 128))
    a = RegionAssigner(center_ratio=0.2, ignore_ratio=0.5)
    res = a.assign([jnp.asarray(x) for x in mlvl_anchors], jnp.asarray(gt),
                   featmap_sizes=featmap_sizes, anchor_scale=4,
                   anchor_strides=strides, img_shape=(128, 128),
                   gt_labels=jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(res.gt_inds), want)
    # labels follow the 1-based codes
    pos = want > 0
    np.testing.assert_array_equal(np.asarray(res.labels)[pos],
                                  labels[want[pos] - 1])
    assert (np.asarray(res.labels)[~pos] == -1).all()


def test_region_assigner_gt_valid_mask_and_jit():
    """Padded gt slots must not affect the result, under jit; the masked
    assignment equals the reference port run on the valid gts alone."""
    import jax
    strides = (8, 16, 32)
    featmap_sizes = [(16, 16), (8, 8), (4, 4)]
    mlvl_anchors_np = []
    for s, (fh, fw) in zip(strides, featmap_sizes):
        xs, ys = np.meshgrid(np.arange(fw) * s + s / 2,
                             np.arange(fh) * s + s / 2)
        c = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        mlvl_anchors_np.append(np.concatenate([c - 2 * s, c + 2 * s], -1))
    mlvl_anchors = [jnp.asarray(x) for x in mlvl_anchors_np]
    gt = jnp.asarray([[10, 10, 60, 56], [40, 30, 110, 100],
                      [0, 0, 1, 1], [0, 0, 1, 1]], jnp.float32)
    gtv = jnp.asarray([True, True, False, False])
    # wider center region than the default so the tiny fixture grid gets
    # genuine positives (0.2 rounds to empty regions at these scales)
    a = RegionAssigner(center_ratio=0.5)

    @jax.jit
    def run(gt, gtv):
        return a.assign(mlvl_anchors, gt, gt_valid=gtv,
                        featmap_sizes=featmap_sizes, anchor_scale=4,
                        anchor_strides=strides, img_shape=(128, 128))
    res = run(gt, gtv)
    want = _region_assign_reference(
        mlvl_anchors_np, np.asarray(gt)[:2], featmap_sizes, 4, strides,
        img_shape=(128, 128), center_ratio=0.5)
    np.testing.assert_array_equal(np.asarray(res.gt_inds), want)
    assert (want > 0).any(), "fixture produced no positives"


def test_approx_max_iou_assigner_group_max():
    """Assignment IoU = max over each location's approx group (reference
    approx_max_iou_assigner.py), assigned boxes = squares."""
    from oadg_tpu.core.bbox.assign_sample import ApproxMaxIoUAssigner
    squares = jnp.asarray([[0., 0, 10, 10], [20, 20, 30, 30]])
    # location 0: one poor approx + one perfect approx for gt0;
    # location 1: both approxes far from gt0
    approxs = jnp.asarray([
        [0., 0, 3, 3],      # loc 0 approx 0 (iou ~0.09)
        [0., 0, 10, 10],    # loc 0 approx 1 (iou 1.0)
        [20., 20, 23, 23],  # loc 1 approx 0
        [20., 20, 30, 30],  # loc 1 approx 1
    ])
    gt = jnp.asarray([[0., 0, 10, 10]])
    gtv = jnp.ones((1,), bool)
    asn = ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
                               min_pos_iou=0.0)
    res = asn.assign(approxs, squares, 2, gt, gtv,
                     gt_labels=jnp.asarray([3]))
    gt_inds = np.asarray(res.gt_inds)
    assert gt_inds[0] == 1          # group max 1.0 -> positive
    assert gt_inds[1] == 0          # far -> negative
    # plain MaxIoU on the squares alone would also assign loc 0, but with
    # approxes whose max beats the square's own IoU the difference shows:
    squares2 = jnp.asarray([[0., 40, 10, 50], [20, 20, 30, 30]])
    res2 = asn.assign(approxs, squares2, 2, gt, gtv)
    assert np.asarray(res2.gt_inds)[0] == 1   # approx group still matches
