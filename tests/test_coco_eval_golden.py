"""COCO evaluator golden tests with HAND-DERIVED expected numbers.

VERDICT r3 item 5: pycocotools is absent from this image, so instead of
library-generated fixtures these cases are small enough that every
number in the COCOeval protocol (pycocotools cocoeval.py, consumed by
the reference at mmdet/datasets/coco.py:364) is derived BY HAND below —
the 101-point interpolated precision grid, the .5:.05:.95 IoU-threshold
average, greedy score-ordered matching, crowd ignore semantics
(IoU = inter/det_area for crowd, matched dets ignored), areaRng
gt/det ignore rules, and per-image maxDets truncation. Each derivation
is written out in the comments; a protocol divergence in any of those
rules shifts the numbers and fails the assert.

Box format: xywh (pycocotools native).
"""
import numpy as np

from oadg_tpu.core.evaluation.coco_eval import COCOEvalBbox


def _run(gts, results, cats=(1,)):
    ev = COCOEvalBbox(gts, results, cat_ids=list(cats))
    return ev.accumulate()


def test_interpolated_ap_with_interleaved_fp():
    """2 GTs, dets [TP(.9), FP(.8), TP(.7)] at IoU=1.

    Matching at every IoU threshold: tp=[1,0,1], fp=[0,1,0]
    -> rc=[1/2, 1/2, 1], pr=[1, 1/2, 2/3].
    Monotone envelope (from the end): [1, 2/3, 2/3].
    101 recall thresholds 0.00..1.00: searchsorted(rc, thr, 'left')
      thr in [0.00, 0.50] (51 values) -> index 0 -> precision 1
      thr in [0.51, 1.00] (50 values) -> index 2 -> precision 2/3
    AP (every IoU threshold, so also the 10-threshold mean)
       = (51*1 + 50*(2/3)) / 101 = 253/303 = 0.8349835...
    AR@100 = 1.0; maxDets=1 keeps only the score-.9 TP -> AR@1 = 0.5.
    Both GTs are small (area 100 < 32^2); the FP det (area 100) stays in
    range for the small split, so AP_small = AP.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0], [50, 50, 10, 10.0]]),
                np.zeros(2))}]
    res = [{1: np.array([[0, 0, 10, 10, 0.9],
                         [200, 200, 10, 10, 0.8],
                         [50, 50, 10, 10, 0.7]])}]
    out = _run(gts, res)
    want = 253.0 / 303.0
    np.testing.assert_allclose(out["bbox_mAP"], want, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_50"], want, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_75"], want, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_s"], want, atol=1e-9)
    assert out["bbox_mAP_m"] == -1.0 and out["bbox_mAP_l"] == -1.0
    np.testing.assert_allclose(out["AR@1"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["AR@10"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR_s@100"], 1.0, atol=1e-9)


def test_iou_threshold_partition():
    """One GT [0,0,10,10]; one det [0,0,10,16.25] score .9.

    inter = 100, union = 100 + 162.5 - 100 = 162.5
    IoU = 100/162.5 = 0.615384...  -> matches thresholds .5, .55, .6
    (3 of 10); at the other 7 it is a lone FP (rc=[0] -> precision 0).
    AP = 3/10, AP50 = 1, AP75 = 0, AR@100 = 3/10.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0]]), np.zeros(1))}]
    res = [{1: np.array([[0, 0, 10, 16.25, 0.9]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 0.3, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_50"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_75"], 0.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 0.3, atol=1e-9)


def test_crowd_ignore_semantics():
    """gt1 normal [0,0,10,10]; gt2 CROWD [100,100,50,50].

    d1 [110,110,20,20] score .9 lies inside the crowd region:
      crowd IoU = inter / det_area = 400/400 = 1.0 -> matches the crowd
      gt -> d1 is an IGNORED det (neither TP nor FP).
      (Union IoU would be 400/2500+... = 0.16 < 0.5: the 1.0 number
      below only comes out if crowd IoU uses inter/det_area.)
    d2 [0,0,10,10] score .8 -> TP on gt1.
    Non-ignored GT count = 1 (crowd gts never count).
    After dropping ignored dets: tp=[1] -> rc=[1], pr=[1] -> AP = 1.0.
    Without crowd handling d1 would be a leading FP: envelope [.5,.5]
    -> AP = 0.5 — so 1.0 pins the crowd rules.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0], [100, 100, 50, 50.0]]),
                np.array([0.0, 1.0]))}]
    res = [{1: np.array([[110, 110, 20, 20, 0.9],
                         [0, 0, 10, 10, 0.8]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_50"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)
    # small split: only gt1 (area 100) counts; d1 matches the crowd gt
    # (ignored at every range) and d2 is its TP -> 1.0 again
    np.testing.assert_allclose(out["bbox_mAP_s"], 1.0, atol=1e-9)


def test_area_ranges_and_maxdets():
    """One image. GTs: small 20x20 (=400), medium 50x50 (=2500), large
    150x150 (=22500). Dets: a leading FP [300,300,10,10] score .95,
    exact TPs on each GT (scores .9/.8/.7), plus 12 trailing FPs
    (10x10, scores .16..0.05).

    ALL range, maxDets=100: order FP,TPs,TPm,TPl,12FP ->
      tp=[0,1,1,1,0*12], rc=[0,1/3,2/3,1,1...], pr=[0,.5,2/3,.75,...]
      envelope -> [.75]*4 then decreasing; every recall threshold maps
      to an index <= 3 -> precision .75 everywhere -> AP = 0.75
      (exact-IoU TPs: same at every threshold -> AP50 = AP75 = 0.75).
    SMALL range: counted GT = the 20x20 one. The .95 FP (area 100) and
      the 12 trailing FPs are IN range (stay FPs); TPm/TPl are unmatched
      dets OUTSIDE the range -> ignored.
      tp=[0,1,0*12] -> rc=[0,1,1..], pr=[0,.5,...] envelope [.5,...]
      -> AP_s = 0.5.
    MEDIUM range: counted GT = 50x50. Every det except TPm is out of
      range and unmatched -> ignored; TPm matches -> AP_m = 1.0.
      LARGE likewise -> AP_l = 1.0.
    maxDets=1 keeps only the .95 FP -> AR@1 = 0 (all ranges).
    maxDets=10 keeps FP + 3 TPs + 6 trailing FPs -> full recall:
      AR@10 = 1.0; AR@100 = 1.0; AR_s = AR_m = AR_l = 1.0.
    """
    gts = [{1: (np.array([[0, 0, 20, 20.0],
                          [100, 0, 50, 50.0],
                          [400, 400, 150, 150.0]]), np.zeros(3))}]
    extra_fp = [[600 + 15 * i, 10, 10, 10, 0.16 - 0.01 * i]
                for i in range(12)]
    res = [{1: np.array([[300, 300, 10, 10, 0.95],
                         [0, 0, 20, 20, 0.9],
                         [100, 0, 50, 50, 0.8],
                         [400, 400, 150, 150, 0.7]] + extra_fp)}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 0.75, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_50"], 0.75, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_75"], 0.75, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_s"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_m"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_l"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@1"], 0.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@10"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR_s@100"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR_m@100"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR_l@100"], 1.0, atol=1e-9)


def test_multi_category_mean_and_absent_category():
    """Two categories: cat 1 perfect (AP 1.0), cat 2 one GT with no det
    (AP 0.0); cat 3 has NO GT anywhere -> excluded from the mean
    (pycocotools averages only over categories with ground truth).
    mAP = (1.0 + 0.0) / 2 = 0.5.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0]]), np.zeros(1)),
            2: (np.array([[30, 30, 10, 10.0]]), np.zeros(1))}]
    res = [{1: np.array([[0, 0, 10, 10, 0.9]])}]
    out = _run(gts, res, cats=(1, 2, 3))
    np.testing.assert_allclose(out["bbox_mAP"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 0.5, atol=1e-9)


def test_ignored_gt_match_preference():
    """A det overlapping both a normal GT and an out-of-range (ignored
    for the small split) GT at HIGHER IoU must keep the NON-ignored gt
    once it clears the threshold (pycocotools: the inner loop breaks
    before the ignored section when m already points at a non-ignored
    gt, so an ignored match never displaces a non-ignored one).

    GTs: g1 [0,0,30,30] (area 900, small), g2 [0,0,34,34] (area 1156,
    medium -> ignored in the small split). det [0,0,33,33] score .9,
    area 1089 (OUT of the small range):
      IoU(g1) = 900/1089 = 0.826446...
      IoU(g2) = 1089/1156 = 0.942041...  (higher!)

    SMALL split (counted GT = g1 only):
      t in {.50...80} (7): g1 clears -> preference rule keeps g1 -> TP
        (det counts even though its own area is out of range: matched
        dets are never area-ignored). rc=[1], pr=[1] -> term 1.0.
      t in {.85,.90}: g1 fails, g2 (ignored) clears -> det matched to
        an ignored gt -> det ignored -> no dets, no tps -> term 0.
      t=.95: nothing clears; unmatched det with out-of-range area ->
        ignored det -> term 0.
      AP_s = 7/10 = 0.7.  (Pure max-IoU matching would send the det to
      g2 at every t <= .9 -> ignored -> AP_s = 0, so 0.7 pins the rule.)

    ALL range (counted GTs = both): max-IoU matching -> det matches g2.
      t in {.50...90} (9): TP with nGT=2 -> rc=[0.5], pr=[1]; envelope
        gives precision 1 for thr <= 0.5 (51 of 101) -> term 51/101.
      t=.95: lone in-range FP -> 0.
      mAP = 9/10 * 51/101 = 459/1010.
    AR_s@100 = 7/10; AR@100 = 9/10 * 1/2 = 0.45.
    """
    gts = [{1: (np.array([[0, 0, 30, 30.0], [0, 0, 34, 34.0]]),
                np.zeros(2))}]
    res = [{1: np.array([[0, 0, 33, 33, 0.9]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP_s"], 0.7, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP"], 459.0 / 1010.0, atol=1e-9)
    np.testing.assert_allclose(out["AR_s@100"], 0.7, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 0.45, atol=1e-9)


def test_equal_score_duplicates_stable_order():
    """Two dets at the SAME score 0.9, input order [FP, TP], one GT.

    pycocotools sorts with np.argsort(-score, kind='mergesort') — STABLE,
    so equal scores keep input order and the FP is evaluated first:
      tp=[0,1] -> rc=[0,1], pr=[0,1/2]; envelope [1/2,1/2];
      searchsorted(rc, thr, 'left') -> index 0 or 1, precision 1/2
      everywhere -> AP = 0.5 at every IoU threshold.
    An UNstable sort that floats the TP first would give rc=[1,1],
    pr=[1,1/2] -> AP = 1.0 — so 0.5 pins the stable tie order.
    AR@100 = 1.0 (the TP still matches regardless of order).
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0]]), np.zeros(1))}]
    res = [{1: np.array([[200, 200, 10, 10, 0.9],
                         [0, 0, 10, 10, 0.9]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_50"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)


def test_maxdets_truncation_before_area_ignore():
    """pycocotools truncates each image's dets to maxDets BEFORE matching
    and BEFORE area-ignore (evaluateImg: dt = dt[0:maxDet]).

    GT: one small box [0,0,10,10] (area 100). Dets: d1 score .9 at
    [200,200,40,40] (area 1600 — OUT of the small range, unmatched),
    d2 score .8 exact TP on the GT.

    ALL range, maxDets=100: d1 is in the ALL range -> a real leading FP.
      tp=[0,1] -> rc=[0,1], pr=[0,1/2] -> AP = 0.5 (every threshold).
    SMALL range: d1 unmatched AND out of range -> ignored det; d2 TP ->
      AP_s = 1.0.
    AR@1 (ALL range): truncation keeps ONLY d1 (higher score), which is
      a FP -> recall 0. If ignored/FP dets were dropped BEFORE the
      maxDets cut, d2 would survive and AR@1 would be 1.0 — the 0 pins
      the truncate-first order. AR@10 keeps both -> 1.0.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0]]), np.zeros(1))}]
    res = [{1: np.array([[200, 200, 40, 40, 0.9],
                         [0, 0, 10, 10, 0.8]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 0.5, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_s"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@1"], 0.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@10"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)


def test_crowd_ignored_even_inside_area_range():
    """Crowd gts are ignored by the _ignore flag itself, NOT by area:
    a crowd gt whose area IS inside the small range must still be
    ignored there, and a det matching it (crowd IoU = inter/det_area)
    is an ignored det, not a FP.

    g1 normal [0,0,10,10] (small); g2 CROWD [100,100,20,20] (area 400 —
    inside the small range). d1 [105,105,10,10] score .9 sits inside the
    crowd: crowd IoU = 100/100 = 1.0 -> matched -> ignored. d2 TP on g1
    score .8. Counted GTs = 1 at ALL and at SMALL -> AP = AP_s = 1.0.
    MEDIUM range: no counted gt anywhere -> category excluded -> -1.
    """
    gts = [{1: (np.array([[0, 0, 10, 10.0], [100, 100, 20, 20.0]]),
                np.array([0.0, 1.0]))}]
    res = [{1: np.array([[105, 105, 10, 10, 0.9],
                         [0, 0, 10, 10, 0.8]])}]
    out = _run(gts, res)
    np.testing.assert_allclose(out["bbox_mAP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(out["bbox_mAP_s"], 1.0, atol=1e-9)
    assert out["bbox_mAP_m"] == -1.0
    np.testing.assert_allclose(out["AR@100"], 1.0, atol=1e-9)
