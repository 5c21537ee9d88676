"""Core box math: IoU, coder, anchors, assigner, sampler, NMS."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oadg_tpu.core.bbox.geometry import bbox_overlaps, bbox_overlaps_np
from oadg_tpu.core.bbox.coder import DeltaXYWHBBoxCoder
from oadg_tpu.core.anchor.anchor_generator import AnchorGenerator
from oadg_tpu.core.bbox.assign_sample import MaxIoUAssigner, RandomSampler
from oadg_tpu.core.post_processing.nms import (
    nms_padded, nms_numpy, multiclass_nms, batched_nms_padded)


def test_iou_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.rand(20, 4) * 100
    a[:, 2:] += a[:, :2] + 1
    b = rng.rand(15, 4) * 100
    b[:, 2:] += b[:, :2] + 1
    got = np.asarray(bbox_overlaps(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    ref = bbox_overlaps_np(a.astype(np.float32), b.astype(np.float32))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_iou_iof_and_aligned():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 5., 10.]])
    assert np.isclose(float(bbox_overlaps(a, b)[0, 0]), 0.5)
    assert np.isclose(float(bbox_overlaps(a, b, mode="iof")[0, 0]), 0.5)
    assert np.isclose(float(bbox_overlaps(b, a, mode="iof")[0, 0]), 1.0)
    al = bbox_overlaps(a, b, is_aligned=True)
    assert al.shape == (1,) and np.isclose(float(al[0]), 0.5)


def test_delta_coder_roundtrip():
    coder = DeltaXYWHBBoxCoder(target_means=[0.1, 0., 0., 0.], target_stds=[0.1, 0.1, 0.2, 0.2])
    rng = np.random.RandomState(1)
    rois = rng.rand(30, 4).astype(np.float32) * 50
    rois[:, 2:] += rois[:, :2] + 5
    gts = rois + rng.randn(30, 4).astype(np.float32) * 2
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 1)
    deltas = coder.encode(jnp.asarray(rois), jnp.asarray(gts))
    dec = coder.decode(jnp.asarray(rois), deltas)
    np.testing.assert_allclose(np.asarray(dec), gts, atol=1e-3)


def test_delta_coder_clip():
    coder = DeltaXYWHBBoxCoder()
    rois = jnp.asarray([[0., 0., 10., 10.]])
    deltas = jnp.asarray([[5., 5., 3., 3.]])
    out = np.asarray(coder.decode(rois, deltas, max_shape=(20, 30)))
    assert out[:, 0].min() >= 0 and out[:, 2].max() <= 30
    assert out[:, 1].min() >= 0 and out[:, 3].max() <= 20


def test_anchor_generator_matches_mmdet_semantics():
    # Values computed from mmdet 2.28 AnchorGenerator for this config.
    gen = AnchorGenerator(strides=[4], ratios=[0.5, 1.0, 2.0], scales=[8])
    base = gen.base_anchors[0]
    assert base.shape == (3, 4)
    # ratio 0.5: w = 4*8/sqrt(0.5) ≈ 45.25, h = 4*8*sqrt(0.5) ≈ 22.63
    np.testing.assert_allclose(base[0], [-22.6274, -11.3137, 22.6274, 11.3137], atol=1e-3)
    np.testing.assert_allclose(base[1], [-16., -16., 16., 16.], atol=1e-4)
    np.testing.assert_allclose(base[2], [-11.3137, -22.6274, 11.3137, 22.6274], atol=1e-3)
    grid = gen.grid_priors([(2, 3)])[0]
    assert grid.shape == (2 * 3 * 3, 4)
    # second location = shift x by stride 4
    np.testing.assert_allclose(grid[3], base[0] + [4, 0, 4, 0], atol=1e-4)
    # second row starts at index 9, shifted y by 4
    np.testing.assert_allclose(grid[9], base[0] + [0, 4, 0, 4], atol=1e-4)


def test_anchor_valid_flags():
    gen = AnchorGenerator(strides=[16], ratios=[1.0], scales=[8])
    flags = gen.valid_flags([(4, 4)], (40, 40))
    # ceil(40/16)=3 valid rows/cols of 4
    f = flags[0].reshape(4, 4)
    assert f[:3, :3].all() and not f[3].any() and not f[:, 3].any()


def _make_assigner_case():
    # anchors and gts crafted to exercise pos/neg/low-quality paths
    anchors = jnp.asarray([
        [0, 0, 10, 10],     # iou with gt0 high
        [0, 0, 9, 9],       # medium iou with gt0
        [50, 50, 60, 60],   # no overlap -> negative
        [100, 100, 110, 110],  # overlaps gt1 weakly (low-quality)
    ], dtype=jnp.float32)
    gts = jnp.asarray([
        [0, 0, 10, 10],
        [98, 98, 112, 104],
    ], dtype=jnp.float32)
    return anchors, gts


def test_max_iou_assigner():
    anchors, gts = _make_assigner_case()
    assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                              match_low_quality=True)
    res = assigner.assign(anchors, gts, gt_valid=jnp.asarray([True, True]),
                          gt_labels=jnp.asarray([2, 5]))
    gt_inds = np.asarray(res.gt_inds)
    assert gt_inds[0] == 1          # exact match -> gt0
    assert gt_inds[1] == 1          # iou (9*9)/(100) = 0.81 -> pos
    assert gt_inds[2] == 0          # negative
    # anchor3 vs gt1: inter = 10*4=40; union=100+84-40=144; iou≈0.28 < 0.3 →
    # negative by threshold, but it IS gt1's best anchor with 0.28 < min_pos_iou
    # so low-quality does not rescue it.
    assert gt_inds[3] == 0
    labels = np.asarray(res.labels)
    assert labels[0] == 2 and labels[2] == -1


def test_max_iou_assigner_low_quality_rescue():
    anchors = jnp.asarray([[0, 0, 10, 10], [96, 96, 112, 112]], dtype=jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
    assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                              match_low_quality=True)
    res = assigner.assign(anchors, gts, gt_valid=jnp.asarray([True, True]))
    # anchor1 vs gt1: inter 100, union 256 → iou 0.39: negative band is <0.3 so
    # it's in neither pos (≥0.7) nor neg (<0.3) → ignore... but low-quality
    # match rescues it as gt1's best anchor.
    assert np.asarray(res.gt_inds)[1] == 2


def test_assigner_respects_gt_valid():
    anchors, gts = _make_assigner_case()
    assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3)
    res = assigner.assign(anchors, gts, gt_valid=jnp.asarray([True, False]))
    assert np.asarray(res.gt_inds)[3] == 0  # gt1 masked -> negative


def test_random_sampler_counts():
    key = jax.random.PRNGKey(0)
    n = 1000
    gt_inds = jnp.zeros((n,), jnp.int32)
    gt_inds = gt_inds.at[:300].set(1)      # 300 positives
    gt_inds = gt_inds.at[300:310].set(-1)  # some ignored
    from oadg_tpu.core.bbox.assign_sample import AssignResult
    res = AssignResult(gt_inds, jnp.zeros(n), jnp.full((n,), -1, jnp.int32))
    sampler = RandomSampler(num=256, pos_fraction=0.5)
    s = sampler.sample(key, res)
    is_pos = np.asarray(s.is_pos)
    valid = np.asarray(s.valid)
    assert s.inds.shape == (256,)
    assert is_pos.sum() == 128  # capped at num*pos_fraction
    assert valid.all()
    # positives come first
    assert is_pos[:128].all() and not is_pos[128:].any()
    # sampled indices must actually be positives/negatives
    inds = np.asarray(s.inds)
    assert (np.asarray(gt_inds)[inds[:128]] > 0).all()
    assert (np.asarray(gt_inds)[inds[128:]] == 0).all()


def test_random_sampler_few_positives():
    key = jax.random.PRNGKey(1)
    n = 500
    gt_inds = jnp.zeros((n,), jnp.int32).at[:5].set(1)
    from oadg_tpu.core.bbox.assign_sample import AssignResult
    res = AssignResult(gt_inds, jnp.zeros(n), jnp.full((n,), -1, jnp.int32))
    s = RandomSampler(num=256, pos_fraction=0.5).sample(key, res)
    is_pos = np.asarray(s.is_pos)
    assert is_pos.sum() == 5
    assert np.asarray(s.valid).sum() == 256  # 5 pos + 251 neg


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [37, 256, 700])
def test_nms_matches_sequential(seed, n):
    rng = np.random.RandomState(seed)
    boxes = rng.rand(n, 4).astype(np.float32) * 60
    boxes[:, 2:] = boxes[:, :2] + 1 + rng.rand(n, 2).astype(np.float32) * 40
    scores = rng.rand(n).astype(np.float32)
    keep_ref = nms_numpy(boxes, scores, 0.5)
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                                 tile_size=128))
    got = np.where(keep)[0]
    assert set(got) == set(keep_ref)


def test_nms_chain_case():
    # suppression chain: a sup b, b would sup c; c must survive
    boxes = np.array([
        [0, 0, 10, 10],
        [0, 4, 10, 14],   # iou with A ~0.43 > 0.4 -> suppressed
        [0, 8, 10, 18],   # iou with B 0.43, with A ~0.11 -> kept
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
    assert keep.tolist() == [True, False, True]


def test_nms_valid_mask():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.5, 0.9, 0.1], np.float32)
    valid = jnp.asarray([True, False, True])
    keep = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=valid))
    assert keep.tolist() == [True, False, True]  # high-score dup is invalid


def test_batched_nms_classes_dont_suppress():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = jnp.asarray([0, 1])
    keep = np.asarray(batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), idxs, 0.5))
    assert keep.tolist() == [True, True]


def test_multiclass_nms():
    n, c = 20, 3
    rng = np.random.RandomState(0)
    boxes = rng.rand(n, 4).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 5
    scores = rng.rand(n, c + 1).astype(np.float32)
    scores /= scores.sum(-1, keepdims=True)
    dets, labels, valid = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                         score_thr=0.05, iou_threshold=0.5,
                                         max_per_img=10, num_classes=c)
    assert dets.shape == (10, 5) and labels.shape == (10,)
    v = np.asarray(valid)
    d = np.asarray(dets)
    # scores sorted desc among valid
    s = d[v, 4]
    assert (np.diff(s) <= 1e-6).all()
    assert (np.asarray(labels)[v] >= 0).all()
    assert (np.asarray(labels)[~v] == -1).all()


def test_eval_map_hand_example():
    """VOC mAP on a constructed example with known PR curve."""
    import numpy as np
    from oadg_tpu.core.evaluation.mean_ap import eval_map
    ann = [dict(bboxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30]],
                                np.float32),
                labels=np.array([0, 0]))]
    # det1 perfect on gt1, det2 misses, det3 perfect on gt2 (lower score)
    dets = [[np.array([[0, 0, 10, 10, 0.9],
                       [50, 50, 60, 60, 0.8],
                       [20, 20, 30, 30, 0.7]], np.float32)]]
    m, per = eval_map(dets, ann, iou_thr=0.5)
    # PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3) -> AP = .5*1 + .5*(2/3)
    assert abs(m - (0.5 * 1.0 + 0.5 * (2.0 / 3.0))) < 1e-6

    m11, _ = eval_map(dets, ann, iou_thr=0.5, mode="11points")
    # 11-pt: recall thresholds 0..1; p_interp(r<=0.5)=1 (6 pts), >0.5 = 2/3
    assert abs(m11 - (6 * 1.0 + 5 * (2 / 3)) / 11.0) < 1e-6


def test_eval_map_ignore_regions():
    import numpy as np
    from oadg_tpu.core.evaluation.mean_ap import eval_map
    ann = [dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                labels=np.array([0]),
                bboxes_ignore=np.array([[40, 40, 60, 60]], np.float32),
                labels_ignore=np.array([0]))]
    dets = [[np.array([[0, 0, 10, 10, 0.9],
                       [40, 40, 60, 60, 0.8]], np.float32)]]
    m, _ = eval_map(dets, ann, iou_thr=0.5)
    assert abs(m - 1.0) < 1e-6          # ignored-region det is neither tp/fp


def _soft_nms_numpy(boxes, scores, iou_thr, sigma, min_score, method,
                    max_out):
    """Sequential soft-NMS reference (Bodla et al. / mmcv.ops.soft_nms)."""
    boxes = boxes.copy().astype(np.float64)
    scores = scores.copy().astype(np.float64)
    alive = np.ones(len(boxes), bool)
    out = {}
    for _ in range(max_out):
        cand = np.where(alive, scores, -np.inf)
        m = int(np.argmax(cand))
        if cand[m] <= min_score:
            break
        out[m] = cand[m]
        alive[m] = False
        # decay the others by overlap with the picked box
        x1 = np.maximum(boxes[m, 0], boxes[:, 0])
        y1 = np.maximum(boxes[m, 1], boxes[:, 1])
        x2 = np.minimum(boxes[m, 2], boxes[:, 2])
        y2 = np.minimum(boxes[m, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        iou = inter / np.maximum(area + area[m] - inter, 1e-12)
        if method == "gaussian":
            decay = np.exp(-(iou ** 2) / sigma)
        else:
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        scores = np.where(alive, scores * decay, scores)
    return out


@pytest.mark.parametrize("method", ["linear", "gaussian"])
def test_soft_nms_matches_sequential(method):
    from oadg_tpu.core.post_processing.nms import soft_nms_padded
    rng = np.random.RandomState(11)
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 60, n)
    boxes[:, 1] = rng.uniform(0, 60, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 40, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 40, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    sc, keep = soft_nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                               iou_threshold=0.3, sigma=0.5,
                               min_score=0.05, method=method, max_out=n)
    ref = _soft_nms_numpy(boxes, scores, 0.3, 0.5, 0.05, method, n)
    got = {int(i): float(s) for i, s in enumerate(np.asarray(sc))
           if np.asarray(keep)[i]}
    assert set(got) == set(ref)
    for i in ref:
        assert got[i] == pytest.approx(ref[i], rel=1e-4)


def test_multiclass_soft_nms_path():
    from oadg_tpu.core.post_processing.nms import multiclass_nms
    rng = np.random.RandomState(2)
    n, c = 30, 3
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 50, n)
    boxes[:, 1] = rng.uniform(0, 50, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 30, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 30, n)
    scores = rng.uniform(0, 1, (n, c + 1)).astype(np.float32)
    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.3, 10, c,
        nms_type="soft_nms")
    v = np.asarray(valid)
    assert v.any()
    d = np.asarray(dets)[v]
    # scores sorted descending, within [0, 1]
    assert np.all(np.diff(d[:, 4]) <= 1e-6)
    assert np.all(d[:, 4] > 0) and np.all(d[:, 4] <= 1)
    assert np.all(np.asarray(labels)[v] >= 0)


def test_topk_large_matches_plain_topk():
    """topk_large is EXACTLY lax.top_k (values and indices), including the
    padded-tail case and the small-n fallback."""
    from oadg_tpu.core.bbox.assign_sample import topk_large
    rng = np.random.RandomState(3)
    for n, k in [(523776, 256), (524288, 128), (200000, 256), (70000, 1000),
                 (1000, 16)]:
        x = jnp.asarray(rng.rand(n).astype(np.float32))
        v0, i0 = jax.lax.top_k(x, k)
        v1, i1 = jax.jit(lambda x: topk_large(x, k))(x)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # duplicate values: tie order (ascending index) must match too
    x = jnp.asarray(np.tile(rng.rand(1024).astype(np.float32), 128))
    v0, i0 = jax.lax.top_k(x, 64)
    v1, i1 = jax.jit(lambda x: topk_large(x, 64))(x)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
