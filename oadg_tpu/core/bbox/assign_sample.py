"""Assigner + sampler as static-shape masked jnp ops (jit-safe).

Replaces the reference's dynamic-shaped MaxIoUAssigner
(mmdet/core/bbox/assigners/max_iou_assigner.py:11) and RandomSampler
(mmdet/core/bbox/samplers/random_sampler.py:9) with fixed-size vectorized
equivalents: ragged index lists become masks and randomized top-k ranks.

Assignment codes match mmdet: -1 = ignore, 0 = negative, j+1 = matched gt j.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.registry import BBOX_ASSIGNERS, BBOX_SAMPLERS
from .geometry import bbox_overlaps


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray       # (N,) int32: -1 ignore / 0 neg / j+1 pos
    max_overlaps: jnp.ndarray  # (N,) float32
    labels: jnp.ndarray        # (N,) int32 gt label of match, -1 otherwise


class SamplingResult(NamedTuple):
    """Fixed-size sample of ``num`` boxes: positives first, then negatives.

    ``inds`` indexes into the candidate box array; entries beyond
    ``pos+neg`` count are arbitrary but masked by ``valid``.
    """
    inds: jnp.ndarray        # (num,) int32 indices into candidates
    is_pos: jnp.ndarray      # (num,) bool
    valid: jnp.ndarray       # (num,) bool (always all-true when enough negs)
    gt_inds: jnp.ndarray     # (num,) int32 assigned code (gathered)
    labels: jnp.ndarray      # (num,) int32 matched gt labels (gathered)


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    """Static-shape MaxIoU assignment.

    Args mirror the reference config schema
    (configs/_base_/models/faster_rcnn_r50_fpn.py train_cfg.rpn.assigner).
    """

    def __init__(self,
                 pos_iou_thr: float,
                 neg_iou_thr,
                 min_pos_iou: float = .0,
                 gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1,
                 ignore_wrt_candidates: bool = True,
                 match_low_quality: bool = True,
                 gpu_assign_thr: int = -1,
                 iou_calculator: Optional[dict] = None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.ignore_wrt_candidates = ignore_wrt_candidates
        self.match_low_quality = match_low_quality

    def assign(self,
               bboxes: jnp.ndarray,
               gt_bboxes: jnp.ndarray,
               gt_valid: jnp.ndarray,
               gt_labels: Optional[jnp.ndarray] = None,
               box_valid: Optional[jnp.ndarray] = None) -> AssignResult:
        """Assign each of N candidate boxes to one of G (padded) gts.

        Args:
            bboxes: (N, 4); gt_bboxes: (G, 4); gt_valid: (G,) bool;
            gt_labels: (G,) int32; box_valid: (N,) bool — invalid candidates
            (padding / out-of-image anchors) are assigned -1 (ignore).
        """
        ious = bbox_overlaps(bboxes, gt_bboxes)          # (N, G)
        ious = jnp.where(gt_valid[None, :], ious, -1.0)  # mask padded gts
        return self.assign_from_ious(ious, gt_valid, gt_labels, box_valid)

    def assign_from_ious(self, ious, gt_valid, gt_labels=None, box_valid=None) -> AssignResult:
        N, G = ious.shape
        max_overlaps = jnp.max(ious, axis=1)             # (N,)
        argmax_overlaps = jnp.argmax(ious, axis=1)       # (N,)

        # start: everything ignored
        assigned = jnp.full((N,), -1, dtype=jnp.int32)
        # negatives
        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            neg = (max_overlaps >= lo) & (max_overlaps < hi)
        else:
            neg = (max_overlaps >= 0) & (max_overlaps < self.neg_iou_thr)
        assigned = jnp.where(neg, 0, assigned)
        # positives by threshold
        pos = max_overlaps >= self.pos_iou_thr
        assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

        if self.match_low_quality:
            # For each gt j: boxes with iou == per-gt max (>= min_pos_iou)
            # get assigned to j. Reference iterates j in order with
            # overwrite, so the highest j wins — expressed as a max.
            gt_max = jnp.max(ious, axis=0)               # (G,)
            cond = (ious == gt_max[None, :]) & gt_valid[None, :] & (
                gt_max[None, :] >= self.min_pos_iou) & (gt_max[None, :] > 0)
            if not self.gt_max_assign_all:
                # only the single argmax box per gt
                gt_argmax = jnp.argmax(ious, axis=0)     # (G,)
                row_ids = jnp.arange(N)[:, None]
                cond = cond & (row_ids == gt_argmax[None, :])
            gt_ids = jnp.arange(1, G + 1, dtype=jnp.int32)[None, :]
            override = jnp.max(jnp.where(cond, gt_ids, 0), axis=1)  # (N,)
            assigned = jnp.where(override > 0, override, assigned)

        if box_valid is not None:
            assigned = jnp.where(box_valid, assigned, -1)

        if gt_labels is not None:
            matched = jnp.clip(assigned - 1, 0, G - 1)
            labels = jnp.where(assigned > 0, gt_labels[matched], -1).astype(jnp.int32)
        else:
            labels = jnp.full((N,), -1, dtype=jnp.int32)
        return AssignResult(assigned, max_overlaps, labels)


def _random_rank(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each True element in a uniformly random order;
    False elements get rank >= num_true."""
    n = mask.shape[0]
    scores = jax.random.uniform(key, (n,)) + jnp.where(mask, 0.0, 2.0)
    order = jnp.argsort(scores)               # True elems first, random order
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


@BBOX_SAMPLERS.register_module()
class RandomSampler:
    """Static-shape random pos/neg sampling.

    Matches reference RandomSampler semantics: sample up to
    ``num * pos_fraction`` positives, fill the rest with random negatives.
    ``add_gt_as_proposals`` is handled by the caller (gt boxes are
    concatenated to the candidate set before assignment — equivalent to the
    reference's in-sampler concat since a gt box assigns to itself).
    """

    def __init__(self, num: int, pos_fraction: float, neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = True, **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, key: jax.Array, assign: AssignResult) -> SamplingResult:
        num = self.num
        max_pos = int(round(num * self.pos_fraction))
        is_pos_all = assign.gt_inds > 0
        is_neg_all = assign.gt_inds == 0
        kp, kn = jax.random.split(key)

        pos_rank = _random_rank(kp, is_pos_all)
        pos_sel = is_pos_all & (pos_rank < max_pos)
        num_pos = jnp.sum(pos_sel)

        neg_needed = num - num_pos
        if self.neg_pos_ub >= 0:
            neg_needed = jnp.minimum(neg_needed, self.neg_pos_ub * jnp.maximum(num_pos, 1))
        neg_rank = _random_rank(kn, is_neg_all)
        neg_sel = is_neg_all & (neg_rank < neg_needed)

        # Fixed-size gather: selected positives (random order), then selected
        # negatives, then the rest; take first ``num``.
        sort_key = jnp.where(pos_sel, pos_rank.astype(jnp.float32),
                             jnp.where(neg_sel, 1e4 + neg_rank.astype(jnp.float32),
                                       1e8 + jnp.arange(assign.gt_inds.shape[0], dtype=jnp.float32)))
        inds = jnp.argsort(sort_key)[:num].astype(jnp.int32)
        is_pos = pos_sel[inds]
        valid = (pos_sel | neg_sel)[inds]
        return SamplingResult(
            inds=inds,
            is_pos=is_pos,
            valid=valid,
            gt_inds=assign.gt_inds[inds],
            labels=assign.labels[inds],
        )

    def sample_masks(self, key: jax.Array, assign: AssignResult) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mask-only variant (no gather) for dense heads: returns
        (pos_mask, neg_mask) over all N candidates."""
        num = self.num
        max_pos = int(round(num * self.pos_fraction))
        is_pos_all = assign.gt_inds > 0
        is_neg_all = assign.gt_inds == 0
        kp, kn = jax.random.split(key)
        pos_rank = _random_rank(kp, is_pos_all)
        pos_sel = is_pos_all & (pos_rank < max_pos)
        neg_needed = num - jnp.sum(pos_sel)
        neg_rank = _random_rank(kn, is_neg_all)
        neg_sel = is_neg_all & (neg_rank < neg_needed)
        return pos_sel, neg_sel


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """All positives + all negatives, no subsampling (reference
    mmdet/core/bbox/samplers/pseudo_sampler.py)."""

    def __init__(self, **kwargs):
        pass

    def sample_masks(self, key, assign: AssignResult):
        return assign.gt_inds > 0, assign.gt_inds == 0


@BBOX_SAMPLERS.register_module()
class OHEMSampler(RandomSampler):
    """Online hard example mining (reference
    mmdet/core/bbox/samplers/ohem_sampler.py:10).

    The reference runs the bbox head on every candidate and keeps the
    highest-loss positives/negatives. Static-shape version: the caller
    passes per-candidate ``hard_scores`` (typically the classification loss
    of each candidate under the current head) and selection ranks by score
    descending instead of uniformly at random. Without scores it degrades
    to RandomSampler — same contract the reference has before the head
    exists (e.g. RPN stage).
    """

    def sample(self, key: jax.Array, assign: AssignResult,
               hard_scores: Optional[jnp.ndarray] = None) -> SamplingResult:
        if hard_scores is None:
            return super().sample(key, assign)
        num = self.num
        max_pos = int(round(num * self.pos_fraction))
        is_pos_all = assign.gt_inds > 0
        is_neg_all = assign.gt_inds == 0
        n = assign.gt_inds.shape[0]

        def hard_rank(mask):
            # rank by loss descending among mask; others pushed to the end
            scores = jnp.where(mask, -hard_scores, jnp.inf)
            order = jnp.argsort(scores)
            return jnp.zeros(n, jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))

        pos_rank = hard_rank(is_pos_all)
        pos_sel = is_pos_all & (pos_rank < max_pos)
        num_pos = jnp.sum(pos_sel)
        neg_needed = num - num_pos
        if self.neg_pos_ub >= 0:
            neg_needed = jnp.minimum(neg_needed,
                                     self.neg_pos_ub * jnp.maximum(num_pos, 1))
        neg_rank = hard_rank(is_neg_all)
        neg_sel = is_neg_all & (neg_rank < neg_needed)
        sort_key = jnp.where(
            pos_sel, pos_rank.astype(jnp.float32),
            jnp.where(neg_sel, 1e4 + neg_rank.astype(jnp.float32),
                      1e8 + jnp.arange(n, dtype=jnp.float32)))
        inds = jnp.argsort(sort_key)[:num].astype(jnp.int32)
        return SamplingResult(
            inds=inds, is_pos=pos_sel[inds], valid=(pos_sel | neg_sel)[inds],
            gt_inds=assign.gt_inds[inds], labels=assign.labels[inds])


@BBOX_ASSIGNERS.register_module()
class ATSSAssigner:
    """Adaptive Training Sample Selection (reference
    mmdet/core/bbox/assigners/atss_assigner.py:12), static-shape.

    Per gt: take the ``topk`` anchors closest by center distance on each
    pyramid level, compute mean+std of their IoUs as an adaptive threshold,
    keep candidates above it whose centers lie inside the gt box. Ragged
    per-level candidate lists become a fixed (G, L*topk) selection mask.
    """

    def __init__(self, topk: int = 9, ignore_iof_thr: float = -1, **kwargs):
        self.topk = topk

    def assign(self, bboxes, num_level_bboxes, gt_bboxes, gt_valid,
               gt_labels=None, box_valid=None) -> AssignResult:
        """bboxes (N,4); num_level_bboxes: python list of per-level counts
        summing to N; gt_bboxes (G,4); gt_valid (G,)."""
        N, G = bboxes.shape[0], gt_bboxes.shape[0]
        ious = bbox_overlaps(bboxes, gt_bboxes)                  # (N, G)
        ious = jnp.where(gt_valid[None, :], ious, 0.0)
        if box_valid is not None:
            ious = jnp.where(box_valid[:, None], ious, 0.0)

        acx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
        acy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
        gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
        gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
        dist = jnp.sqrt((acx[:, None] - gcx[None, :]) ** 2
                        + (acy[:, None] - gcy[None, :]) ** 2)    # (N, G)
        if box_valid is not None:
            dist = jnp.where(box_valid[:, None], dist, jnp.inf)

        # per-level top-k by distance -> candidate mask (N, G)
        cand = jnp.zeros((N, G), bool)
        start = 0
        for nl in num_level_bboxes:
            d = dist[start:start + nl]                           # (nl, G)
            k = min(self.topk, nl)
            thr = -jax.lax.top_k(-d.T, k)[0][:, -1]              # (G,) kth dist
            cand = cand.at[start:start + nl].set(d <= thr[None, :])
            start += nl

        # adaptive IoU threshold over candidates: mean + std
        ci = jnp.where(cand, ious, 0.0)
        cnt = jnp.maximum(jnp.sum(cand, axis=0), 1)              # (G,)
        mean = jnp.sum(ci, axis=0) / cnt
        var = jnp.sum(jnp.where(cand, (ious - mean[None, :]) ** 2, 0.0),
                      axis=0) / cnt
        thr = mean + jnp.sqrt(var)                               # (G,)

        inside = ((acx[:, None] >= gt_bboxes[None, :, 0])
                  & (acx[:, None] <= gt_bboxes[None, :, 2])
                  & (acy[:, None] >= gt_bboxes[None, :, 1])
                  & (acy[:, None] <= gt_bboxes[None, :, 3]))
        pos = cand & inside & (ious >= thr[None, :]) & gt_valid[None, :]

        # each anchor -> gt of max IoU among its positive matches
        pos_ious = jnp.where(pos, ious, -1.0)
        best = jnp.argmax(pos_ious, axis=1)                      # (N,)
        has = jnp.max(pos_ious, axis=1) > -0.5
        assigned = jnp.where(has, best.astype(jnp.int32) + 1, 0)
        if box_valid is not None:
            assigned = jnp.where(box_valid, assigned, -1)
        max_overlaps = jnp.max(jnp.where(gt_valid[None, :], ious, -1.0), axis=1)
        if gt_labels is not None:
            matched = jnp.clip(assigned - 1, 0, G - 1)
            labels = jnp.where(assigned > 0, gt_labels[matched], -1).astype(jnp.int32)
        else:
            labels = jnp.full((N,), -1, jnp.int32)
        return AssignResult(assigned, max_overlaps, labels)


@BBOX_ASSIGNERS.register_module()
class GridAssigner:
    """Config-surface entry for YOLO grid assignment (reference
    core/bbox/assigners/grid_assigner.py); the static-shape implementation
    lives in models/dense_heads/yolo_head.py _targets_single."""

    def __init__(self, pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
                 gt_max_assign_all=True, **kwargs):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou


@BBOX_ASSIGNERS.register_module()
class TaskAlignedAssigner:
    """Config-surface entry (reference task_aligned_assigner.py); the
    static-shape implementation lives in models/dense_heads/tood_head.py
    (t = s^alpha * u^beta top-k as a dense (P, G) mask)."""

    def __init__(self, topk=13, **kw):
        self.topk = topk


@BBOX_ASSIGNERS.register_module()
class UniformAssigner:
    """Config-surface entry (reference uniform_assigner.py); implementation
    in models/dense_heads/yolof_head.py (anchor+pred top-k center-distance
    candidates with IoU filters)."""

    def __init__(self, pos_ignore_thr=0.15, neg_ignore_thr=0.7,
                 match_times=4, **kw):
        self.pos_ignore_thr = pos_ignore_thr
        self.neg_ignore_thr = neg_ignore_thr
        self.match_times = match_times


@BBOX_ASSIGNERS.register_module()
class PointAssigner:
    """Config-surface entry (reference point_assigner.py); implementation
    in models/dense_heads/reppoints_head.py (scale-matched nearest-point
    selection matrix)."""

    def __init__(self, scale=4, pos_num=3, **kw):
        self.scale = scale
        self.pos_num = pos_num


@BBOX_ASSIGNERS.register_module()
class RegionAssigner:
    """Config-surface entry (reference region_assigner.py); implementation
    in models/dense_heads/cascade_rpn_head.py (_region_targets)."""

    def __init__(self, center_ratio=0.2, ignore_ratio=0.5, **kw):
        self.center_ratio = center_ratio
        self.ignore_ratio = ignore_ratio


@BBOX_ASSIGNERS.register_module()
class CenterRegionAssigner(MaxIoUAssigner):
    """Center-region positive gating on top of MaxIoU (reference
    center_region_assigner.py, FSAF-family); the dense center-region rule
    lives in models/dense_heads/fovea_fsaf_heads.py."""

    def __init__(self, pos_scale=0.2, neg_scale=0.2, **kw):
        super().__init__(pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale


@BBOX_ASSIGNERS.register_module()
class ApproxMaxIoUAssigner(MaxIoUAssigner):
    """reference approx_max_iou_assigner.py: assigns by the max IoU over a
    group of approx anchors per location. The static-shape SABL/GA heads
    use square approx anchors, for which the group max equals the single
    square-anchor IoU — so MaxIoU semantics apply directly."""
    pass


@BBOX_ASSIGNERS.register_module()
class SimOTAAssigner:
    """Config-surface entry (reference sim_ota_assigner.py); the static
    top-k dynamic-k implementation lives in
    models/dense_heads/yolox_head.py."""

    def __init__(self, center_radius=2.5, candidate_topk=10, **kw):
        self.center_radius = center_radius
        self.candidate_topk = candidate_topk


@BBOX_SAMPLERS.register_module()
class InstanceBalancedPosSampler(RandomSampler):
    """reference instance_balanced_pos_sampler.py: positives spread evenly
    across instances. The randomized-rank sampler already draws positives
    uniformly over the (instance-tagged) positive set — per-instance
    balance is approximated by that uniform draw (documented divergence:
    exact per-instance quotas need ragged grouping)."""
    pass


@BBOX_SAMPLERS.register_module()
class IoUBalancedNegSampler(RandomSampler):
    """reference iou_balanced_neg_sampler.py: negatives stratified over IoU
    bins. Approximated by the uniform randomized-rank draw (divergence
    documented; OHEMSampler covers the hard-negative use case)."""

    def __init__(self, num, pos_fraction, floor_thr=-1, floor_fraction=0,
                 num_bins=3, **kw):
        super().__init__(num=num, pos_fraction=pos_fraction)


@BBOX_SAMPLERS.register_module()
class ScoreHLRSampler(OHEMSampler):
    """reference score_hlr_sampler.py: hard-negative mining by score —
    served by the OHEM ranking machinery."""
    pass


@BBOX_SAMPLERS.register_module()
class CombinedSampler(RandomSampler):
    """reference combined_sampler.py: separate pos/neg sampler cfgs; both
    resolve onto the masked randomized-rank sampler here."""

    def __init__(self, num, pos_fraction, pos_sampler=None, neg_sampler=None,
                 **kw):
        super().__init__(num=num, pos_fraction=pos_fraction)


@BBOX_SAMPLERS.register_module()
class MaskPseudoSampler(PseudoSampler):
    """reference mask_pseudo_sampler.py."""
    pass
