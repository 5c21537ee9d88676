"""Real balanced samplers vs the reference algorithms on numpy fixtures
(reference mmdet/core/bbox/samplers/{instance_balanced_pos_sampler,
iou_balanced_neg_sampler,score_hlr_sampler}.py).

The reference algorithms have deterministic *count* invariants (per-
instance / per-bin quotas, fill rules) even though the draws are random;
the tests assert those invariants exactly, over several PRNG keys.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.core.bbox.assign_sample import (AssignResult,
                                              InstanceBalancedPosSampler,
                                              IoUBalancedNegSampler,
                                              ScoreHLRSampler,
                                              score_hlr_importance,
                                              _segmented_rank)


def _assign(gt_inds, max_overlaps=None, labels=None):
    gt_inds = jnp.asarray(gt_inds, jnp.int32)
    n = gt_inds.shape[0]
    mo = (jnp.asarray(max_overlaps, jnp.float32) if max_overlaps is not None
          else jnp.where(gt_inds > 0, 0.8, 0.1))
    lb = (jnp.asarray(labels, jnp.int32) if labels is not None
          else jnp.where(gt_inds > 0, 0, -1))
    return AssignResult(gt_inds, mo, lb)


def test_segmented_rank_basic():
    mask = jnp.array([1, 1, 0, 1, 1, 1], bool)
    seg = jnp.array([2, 1, 1, 2, 1, 2])
    vals = jnp.array([0.3, 0.9, 0.0, 0.1, 0.2, 0.5])
    r = np.asarray(_segmented_rank(mask, seg, vals))
    # seg 1 (masked): vals 0.9,0.2 -> ranks 1,0 ; seg 2: 0.3,0.1,0.5 -> 1,0,2
    assert r[1] == 1 and r[4] == 0
    assert r[0] == 1 and r[3] == 0 and r[5] == 2
    assert r[2] >= 6 - 1  # masked-out gets large rank


def test_instance_balanced_per_instance_quotas():
    """Fixture: pos counts per instance [20, 4, 1], expected pos = 12.
    Reference: quota = round(12/3)+1 = 5 -> first pass 5+4+1 = 10, two
    extras drawn from instance 1's remainder => final per-instance counts
    exactly (7, 4, 1)."""
    gt_inds = np.zeros(60, np.int32)
    gt_inds[:20] = 1
    gt_inds[20:24] = 2
    gt_inds[24] = 3
    # rest negatives
    s = InstanceBalancedPosSampler(num=48, pos_fraction=0.25)  # max_pos 12
    for seed in range(5):
        res = s.sample(jax.random.PRNGKey(seed), _assign(gt_inds))
        sel = np.asarray(res.inds)[np.asarray(res.is_pos)]
        sel_gt = gt_inds[sel]
        assert len(sel) == 12
        assert (sel_gt == 1).sum() == 7
        assert (sel_gt == 2).sum() == 4
        assert (sel_gt == 3).sum() == 1


def test_instance_balanced_takes_all_when_few():
    gt_inds = np.zeros(40, np.int32)
    gt_inds[:5] = 1
    s = InstanceBalancedPosSampler(num=48, pos_fraction=0.25)
    res = s.sample(jax.random.PRNGKey(0), _assign(gt_inds))
    assert int(np.asarray(res.is_pos).sum()) == 5


def test_iou_balanced_bin_quotas():
    """floor_thr=0.1, floor_fraction=0.5, num_bins=2, neg_needed=16:
    exp_iou = 8, per_bin = 4. Bins over [0.1, max_iou=0.3]: bin0
    [0.1,0.2) has 10 negs, bin1 [0.2,0.3] has 10 -> 4 each; floor pool
    (IoU<0.1) supplies the remaining 8."""
    n = 120
    gt_inds = np.zeros(n, np.int32)
    iou = np.full(n, 0.01, np.float32)
    iou[:10] = np.linspace(0.1, 0.18, 10)    # bin 0 (edges stay off-boundary)
    iou[10:20] = np.linspace(0.22, 0.3, 10)  # bin 1 (includes global max)
    s = IoUBalancedNegSampler(num=16, pos_fraction=0.0, floor_thr=0.1,
                              floor_fraction=0.5, num_bins=2)
    for seed in range(5):
        res = s.sample(jax.random.PRNGKey(seed), _assign(gt_inds, iou))
        sel = np.asarray(res.inds)[np.asarray(res.valid)]
        sel_iou = iou[sel]
        assert len(sel) == 16
        assert ((sel_iou >= 0.1) & (sel_iou < 0.2)).sum() == 4
        assert (sel_iou >= 0.22).sum() == 4
        assert (sel_iou < 0.1).sum() == 8


def test_iou_balanced_fills_thin_bins():
    """A bin with fewer elements than its quota contributes all of them;
    the shortfall is refilled from other negatives (total always met)."""
    n = 60
    gt_inds = np.zeros(n, np.int32)
    iou = np.full(n, 0.01, np.float32)
    iou[0] = 0.55                            # lone high-IoU neg, bin 2
    iou[1:6] = 0.25                          # bin 1
    s = IoUBalancedNegSampler(num=20, pos_fraction=0.0, floor_thr=-1,
                              floor_fraction=0, num_bins=3)
    for seed in range(3):
        res = s.sample(jax.random.PRNGKey(seed), _assign(gt_inds, iou))
        sel = np.asarray(res.inds)[np.asarray(res.valid)]
        assert len(sel) == 20
        assert 0 in sel                       # lone hard negative always in
        assert set(range(1, 6)) <= set(sel.tolist())


def test_iou_balanced_all_when_few():
    gt_inds = np.zeros(10, np.int32)
    s = IoUBalancedNegSampler(num=32, pos_fraction=0.0)
    res = s.sample(jax.random.PRNGKey(1), _assign(gt_inds))
    sel = np.asarray(res.inds)[np.asarray(res.valid)]
    assert len(sel) == 10


def _np_importance(valid_idx, groups, scores, num_valid):
    """Reference importance (score_hlr_sampler.py:178-186) in numpy."""
    imp = np.zeros(len(scores))
    for g in groups:
        order = np.argsort(-scores[g])
        for rank, gi in enumerate(np.asarray(g)[order]):
            imp[gi] = num_valid - rank + scores[gi]
    return imp


def test_score_hlr_importance_matches_numpy():
    """nms_match grouping + two-step rank vs a hand-run of the reference
    formula on a fixture with two spatial clusters."""
    boxes = np.array([
        [0, 0, 10, 10], [1, 1, 11, 11], [2, 0, 12, 10],      # cluster A
        [50, 50, 60, 60], [51, 51, 61, 61],                  # cluster B
        [100, 100, 110, 110],                                # lone
    ], np.float32)
    scores = np.array([0.9, 0.6, 0.3, 0.8, 0.7, 0.2], np.float32)
    valid = jnp.ones(6, bool)
    from oadg_tpu.core.post_processing.nms import nms_match
    match = nms_match(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                      valid=valid)
    imp = np.asarray(score_hlr_importance(valid, match, jnp.asarray(scores)))
    groups = [[0, 1, 2], [3, 4], [5]]
    want = _np_importance(np.arange(6), groups, scores, 6)
    np.testing.assert_allclose(imp, want, atol=1e-5)


def test_score_hlr_sample_prefers_valid_and_weights():
    """Negs with score > thr are selected before low-score ones; weights
    decrease with importance rank and low-score picks get the min."""
    n = 30
    gt_inds = np.zeros(n, np.int32)
    gt_inds[0] = 1                            # one positive
    rng = np.random.RandomState(0)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = np.arange(n) * 100          # no overlaps: each own group
    boxes[:, 1] = 0
    boxes[:, 2] = boxes[:, 0] + 10
    boxes[:, 3] = 10
    scores = np.full(n, 0.01, np.float32)
    hard = [3, 7, 11, 15]
    scores[hard] = [0.9, 0.7, 0.5, 0.3]
    s = ScoreHLRSampler(num=8, pos_fraction=0.125, score_thr=0.05)
    res = s.sample(jax.random.PRNGKey(0), _assign(gt_inds),
                   hlr=(jnp.asarray(scores), jnp.asarray(boxes)))
    sel = np.asarray(res.inds)[np.asarray(res.valid)]
    sel_negs = [i for i in sel if gt_inds[i] == 0]
    assert set(hard) <= set(sel_negs)         # all hard negs selected
    w = np.asarray(s.last_neg_label_weights)
    slot_ids = np.asarray(res.inds)
    is_neg_slot = np.asarray(res.valid & ~res.is_pos)
    hard_w = {slot_ids[i]: w[i] for i in range(len(w)) if is_neg_slot[i]
              and slot_ids[i] in hard}
    # higher score => higher importance => lower rank => larger weight
    assert hard_w[3] > hard_w[7] > hard_w[11] > hard_w[15]
    low_ws = [w[i] for i in range(len(w)) if is_neg_slot[i]
              and slot_ids[i] not in hard]
    if low_ws:
        assert np.allclose(low_ws, min(hard_w.values()))


def test_score_hlr_without_context_degrades_to_random():
    gt_inds = np.zeros(20, np.int32)
    gt_inds[:2] = 1
    s = ScoreHLRSampler(num=8, pos_fraction=0.25)
    res = s.sample(jax.random.PRNGKey(0), _assign(gt_inds))
    assert int(np.asarray(res.valid).sum()) == 8


def test_registry_builds_real_classes():
    from oadg_tpu.utils.registry import BBOX_SAMPLERS
    assert BBOX_SAMPLERS.get("InstanceBalancedPosSampler") is InstanceBalancedPosSampler
    assert BBOX_SAMPLERS.get("IoUBalancedNegSampler") is IoUBalancedNegSampler
    assert BBOX_SAMPLERS.get("ScoreHLRSampler") is ScoreHLRSampler


def test_roi_head_uses_configured_sampler(monkeypatch):
    """StandardRoIHead must build the sampler type named in the config
    (round-1 verdict: it silently used RandomSampler) and train with it."""
    from oadg_tpu.models import build_detector
    from tests.test_forward import BASE_MODEL, TEST_CFG, TRAIN_CFG, _batch

    built = []
    orig = IoUBalancedNegSampler.__init__

    def spy(self, *a, **k):
        built.append(True)
        orig(self, *a, **k)

    monkeypatch.setattr(IoUBalancedNegSampler, "__init__", spy)

    tc = dict(TRAIN_CFG)
    tc["rcnn"] = dict(tc["rcnn"])
    tc["rcnn"]["sampler"] = dict(type='IoUBalancedNegSampler', num=32,
                                 pos_fraction=0.25, floor_thr=-1,
                                 floor_fraction=0, num_bins=3)
    det = build_detector(dict(BASE_MODEL), tc, TEST_CFG)
    batch = _batch()
    variables = jax.jit(lambda r, b: det.init(r, b, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    out = det.apply(variables, batch, "train",
                    rngs={"sampling": jax.random.PRNGKey(2)})
    assert built, "configured IoUBalancedNegSampler was never constructed"
    assert all(np.isfinite(float(jnp.sum(v))) for v in out.values())
