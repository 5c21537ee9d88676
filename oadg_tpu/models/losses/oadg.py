"""OA-Loss family: view-chunked supervised losses + JSD consistency +
supervised-contrastive loss (the OA-DG method core).

Faithful to the reference semantics (behavioral invariants, SURVEY.md §2.1):
- supervised CE / SmoothL1 / L1 train on the **view-1 chunk only**
  (reference mmdet/models/losses/oadg/cross_entropy_loss_plus.py:40,
  smooth_l1_loss_plus.py:26-27); the given ``avg_factor`` is used as-is
  (counted over all views) — this scaling is part of the method.
- JSD consistency (``jsdv1_3`` 3-view / ``jsdv1_3_2aug`` 2-view,
  cross_entropy_loss_plus.py:192-319) runs over ALL rows, unweighted
  (``additional_loss_weight_reduce=False`` default nulls the weights):
  sigmoid->(p, 1-p) for 1-logit RPN scores, softmax otherwise; the mixture
  is clamped to [1e-7, 1]; the row-summed mean-KL total is divided by
  ``avg_factor``.
- ``supcontrast`` (contrastive_loss.py:170-232): anchor mask = same-class fg
  pairs (excluding self) + same-instance-across-views bg pairs; contrast
  mask = all-except-self; InfoNCE at ``temper`` with row-max subtraction.
  The reference hard-codes the block layout via ``ori_size = 512*num_views``;
  here the layout (roi rows per view, random-proposal rows per view) is
  explicit and static.

Everything is static-shape: "returns 0 when too few foregrounds" becomes a
``jnp.where`` on the fg count.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .common import (binary_cross_entropy_with_logits, l1, smooth_l1,
                     softmax_cross_entropy, weight_reduce_loss)


def _view1(x, num_views: int):
    """First chunk of a views-major array (rows = [view1; view2; ...])."""
    if x is None:
        return None
    return x[: x.shape[0] // num_views]


def jsd_consistency(pred, num_views: int, avg_factor) -> jnp.ndarray:
    """jsdv1_3 / jsdv1_3_2aug: mean KL of each view to the clamped mixture,
    summed over rows and classes, divided by avg_factor."""
    chunks = jnp.split(pred, num_views, axis=0)
    if pred.shape[-1] == 1:          # RPN: sigmoid -> (p, 1-p)
        ps = [jnp.concatenate([jax.nn.sigmoid(c), 1 - jax.nn.sigmoid(c)], axis=-1)
              for c in chunks]
    else:
        ps = [jax.nn.softmax(c, axis=-1) for c in chunks]
    mix = sum(ps) / num_views
    log_mix = jnp.log(jnp.clip(mix, 1e-7, 1.0))
    # F.kl_div(log_mix, p) = sum p * (log p - log_mix)
    kl = sum(p * (jnp.log(jnp.clip(p, 1e-12, 1.0)) - log_mix) for p in ps) / num_views
    total = jnp.sum(kl)
    return total / avg_factor


@LOSSES.register_module()
class CrossEntropyLossPlus:
    """CE on view-1 + lambda * JSD across views (reference
    cross_entropy_loss_plus.py:322)."""

    def __init__(self, use_sigmoid=False, reduction="mean", class_weight=None,
                 ignore_index=None, loss_weight=1.0, additional_loss="jsd",
                 additional_loss_weight_reduce=False, lambda_weight=0.0001,
                 num_views=3, avg="1.0", wandb_name=None, **kw):
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = -100 if ignore_index is None else ignore_index
        self.additional_loss = additional_loss
        self.lambda_weight = lambda_weight
        self.num_views = num_views
        self.avg = avg
        self.wandb_name = wandb_name
        self.wandb_features = {}

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        v = self.num_views
        pred1 = _view1(cls_score, v)
        label1 = _view1(label, v)
        weight1 = _view1(weight, v)
        af = avg_factor / v if self.avg == "1.1" else avg_factor

        if self.use_sigmoid:
            if cls_score.ndim != label.ndim:
                nc = cls_score.shape[-1]
                valid = (label1 >= 0) & (label1 != self.ignore_index)
                onehot = jax.nn.one_hot(jnp.where(label1 < nc, label1, -1), nc)
                ce = binary_cross_entropy_with_logits(pred1, onehot)
                w = valid[..., None].astype(jnp.float32)
                if weight1 is not None:
                    w = w * weight1[..., None]
                loss_cls = weight_reduce_loss(ce, w, red, af)
            else:
                ce = binary_cross_entropy_with_logits(pred1, label1)
                loss_cls = weight_reduce_loss(ce, weight1, red, af)
        else:
            ce = softmax_cross_entropy(pred1, label1, self.ignore_index)
            loss_cls = weight_reduce_loss(ce, weight1, red, af)
        loss = self.loss_weight * loss_cls

        if self.additional_loss in ("jsdv1_3", "jsdv1_3_2aug", "jsd"):
            loss = loss + self.lambda_weight * jsd_consistency(
                cls_score, v, avg_factor)
        return loss


class _RegPlusBase:
    def __init__(self, reduction="mean", loss_weight=1.0,
                 additional_loss="None", lambda_weight=0.0001, num_views=3,
                 wandb_name=None, **kw):
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.additional_loss = additional_loss
        self.lambda_weight = lambda_weight
        self.num_views = num_views
        self.wandb_features = {}

    def _elementwise(self, pred, target):
        raise NotImplementedError

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        v = self.num_views
        loss = self._elementwise(_view1(pred, v), _view1(target, v))
        return self.loss_weight * weight_reduce_loss(
            loss, _view1(weight, v), red, avg_factor)


@LOSSES.register_module()
class SmoothL1LossPlus(_RegPlusBase):
    def __init__(self, beta=1.0, **kw):
        super().__init__(**kw)
        self.beta = beta

    def _elementwise(self, pred, target):
        return smooth_l1(pred, target, self.beta)


@LOSSES.register_module()
class L1LossPlus(_RegPlusBase):
    def _elementwise(self, pred, target):
        return l1(pred, target)


def supcontrast(feats, labels, valid, layout, temper=0.07, min_samples=10):
    """Static-shape supervised contrastive loss over L2-normalized features.

    Args:
        feats: (N, D) features — rows laid out as
            [R roi rows x num_views views ; P random-proposal rows x views]
            where ``layout = (R, num_views, P)`` gives the static block sizes
            (R = rois per view, P = random proposals per view).
        labels: (N,) int labels; background = max class id (num_classes).
        valid: (N,) bool — padding rows excluded from every mask.
        temper: temperature (config ``temperature=0.06``).
        min_samples: returns 0 unless fg count > min_samples.

    Returns scalar loss.
    """
    r, v, p = layout
    n = feats.shape[0]
    assert n == r * v + p * v, "layout mismatch"
    x = feats / jnp.maximum(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

    bg_label = jnp.max(jnp.where(valid, labels, -1))
    fg = (labels != bg_label) & valid
    bgm = (labels == bg_label) & valid

    # same-instance-across-views mask (eye blocks between view chunks)
    idx = jnp.arange(n)
    block = jnp.where(idx < r * v, 0, 1)                 # 0 = roi rows, 1 = rp rows
    within = jnp.where(block == 0, idx, idx - r * v)
    size = jnp.where(block == 0, r, p)
    inst = within % jnp.maximum(size, 1)
    same_inst = ((block[:, None] == block[None, :])
                 & (inst[:, None] == inst[None, :])
                 & ((within[:, None] // jnp.maximum(size[:, None], 1))
                    != (within[None, :] // jnp.maximum(size[None, :], 1))))
    mask_anchor_bg = same_inst & bgm[:, None] & bgm[None, :]

    eye = jnp.eye(n, dtype=bool)
    same_label = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    mask_anchor_fg = same_label & ~eye & fg[:, None] & fg[None, :]
    mask_anchor = (mask_anchor_fg | mask_anchor_bg).astype(jnp.float32)
    mask_contrast = ((~eye) & valid[:, None] & valid[None, :]).astype(jnp.float32)

    logits = (x @ x.T) / temper
    logits = jnp.where(mask_contrast > 0, logits, -jnp.inf)
    row_max = jnp.max(logits, axis=1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    z = logits - jax.lax.stop_gradient(row_max)
    exp_z = jnp.where(mask_contrast > 0, jnp.exp(z), 0.0)
    log_prob = z - jnp.log(jnp.maximum(exp_z.sum(1, keepdims=True), 1e-12))
    log_prob = jnp.where(mask_contrast > 0, log_prob, 0.0)
    mean_log_prob_pos = (mask_anchor * log_prob).sum(1) / (mask_anchor.sum(1) + 1e-8)
    per_row = -mean_log_prob_pos
    # reference .mean() runs over every row; padding rows contribute 0 via
    # empty anchor masks but still count — we average over valid rows only,
    # the faithful reading of its dense layout.
    loss = jnp.sum(jnp.where(valid, per_row, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    enough = jnp.sum(fg) > min_samples
    return jnp.where(enough, loss, 0.0)


@LOSSES.register_module()
class ContrastiveLossPlus:
    """Wrapper matching reference contrastive_loss_plus.py:11: L2-normalize,
    extend random-proposal labels with bg, call supcontrast."""

    def __init__(self, loss_weight=1, temperature=0.07, num_views=2,
                 normalized_input=True, min_samples=10, version="r-cnn", **kw):
        self.loss_weight = loss_weight
        self.temperature = temperature
        self.num_views = num_views
        self.min_samples = min_samples
        self.num_classes = None      # set by the head, like the reference

    def __call__(self, cont_feats, labels, valid, layout):
        loss = supcontrast(cont_feats, labels, valid, layout,
                           temper=self.temperature,
                           min_samples=self.min_samples)
        return self.loss_weight * loss
