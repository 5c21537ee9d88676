"""Remaining stock losses (reference mmdet/models/losses/): VarifocalLoss
(varifocal_loss.py), SeesawLoss (seesaw_loss.py), KD KL-divergence
(kd_loss.py), AssociativeEmbeddingLoss (ae_loss.py, CornerNet push/pull).

All pure jnp with the weight_reduce_loss contract; ragged per-instance
indexing in the reference (AE loss loops over gt corners) becomes masked
matrix arithmetic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES
from .common import (binary_cross_entropy_with_logits, weight_reduce_loss)


@LOSSES.register_module()
class VarifocalLoss:
    """IoU-aware classification (reference varifocal_loss.py:11): target is
    the gt IoU on positives; negatives get alpha * p^gamma focal weight."""

    def __init__(self, use_sigmoid=True, alpha=0.75, gamma=2.0,
                 iou_weighted=True, reduction="mean", loss_weight=1.0, **kw):
        assert use_sigmoid
        self.alpha, self.gamma = alpha, gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        """pred: (..., C) logits; target: (..., C) float (iou at the gt
        class on positives, 0 elsewhere)."""
        red = reduction_override or self.reduction
        p = jax.nn.sigmoid(pred)
        pos = (target > 0).astype(pred.dtype)
        if self.iou_weighted:
            focal = (target * pos
                     + self.alpha * jnp.abs(p - target) ** self.gamma
                     * (1 - pos))
        else:
            focal = (pos + self.alpha * jnp.abs(p - target) ** self.gamma
                     * (1 - pos))
        loss = binary_cross_entropy_with_logits(pred, target) * focal
        if weight is not None and weight.ndim + 1 == loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(loss, weight, red,
                                                     avg_factor)


@LOSSES.register_module()
class KnowledgeDistillationKLDivLoss:
    """Soft-label KL for LD (reference kd_loss.py:24): T^2 * KL(student||teacher)."""

    def __init__(self, reduction="mean", loss_weight=1.0, T=10, **kw):
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.T = T

    def __call__(self, pred, soft_label, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        t = self.T
        tgt = jax.nn.softmax(soft_label / t, axis=-1)
        logp = jax.nn.log_softmax(pred / t, axis=-1)
        kd = jnp.sum(tgt * (jnp.log(jnp.clip(tgt, 1e-12, None)) - logp),
                     axis=-1) * (t * t)
        return self.loss_weight * weight_reduce_loss(kd, weight, red,
                                                     avg_factor)


@LOSSES.register_module()
class SeesawLoss:
    """Long-tail CE with per-class mitigation/compensation factors
    (reference seesaw_loss.py). Cumulative class counts are carried as a
    running buffer passed in by the caller (stateless jnp version)."""

    def __init__(self, use_sigmoid=False, p=0.8, q=2.0, num_classes=1203,
                 eps=1e-2, reduction="mean", loss_weight=1.0, **kw):
        assert not use_sigmoid
        self.p, self.q = p, q
        self.num_classes = num_classes
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, cls_score, labels, weight=None, avg_factor=None,
                 cum_samples=None, reduction_override=None, **kw):
        """cls_score: (N, C+2) (obj channels appended as in reference) or
        (N, C); labels in [0, C]; cum_samples (C,) class frequency."""
        red = reduction_override or self.reduction
        nc = self.num_classes
        score = cls_score[..., :nc]
        n = score.shape[0]
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, nc - 1), nc)
        fg = (labels < nc)
        if cum_samples is None:
            cum_samples = jnp.ones((nc,), jnp.float32)
        # mitigation: dampen gradients from rare->frequent confusion
        ratio = (cum_samples[None, :]
                 / jnp.clip(cum_samples[:, None], 1.0, None))   # (C,C)
        mit = jnp.where(ratio < 1.0, ratio ** self.p, 1.0)
        sw = jnp.einsum("nc,cd->nd", onehot, mit)
        # compensation: boost misclassified
        probs = jax.nn.softmax(score, axis=-1)
        pg = jnp.take_along_axis(probs, jnp.clip(labels, 0, nc - 1)[..., None],
                                 -1)
        comp = jnp.clip(probs / jnp.clip(pg, self.eps, None), 1.0,
                        None) ** self.q
        sw = sw * jnp.where(probs > pg, comp, 1.0)
        sw = jnp.where(onehot > 0, 1.0, sw)
        adj = score + jnp.log(jnp.clip(sw, 1e-12, None))
        logp = jax.nn.log_softmax(adj, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.clip(labels, 0, nc - 1)[..., None],
                                   -1)[..., 0]
        nll = jnp.where(fg, nll, 0.0)
        w = fg.astype(jnp.float32) if weight is None else weight * fg
        return self.loss_weight * weight_reduce_loss(nll, w, red, avg_factor)


@LOSSES.register_module()
class AssociativeEmbeddingLoss:
    """CornerNet pull/push embedding loss (reference ae_loss.py:9).

    Inputs are dense per-gt embeddings with a validity mask instead of the
    reference's ragged per-image corner index lists.
    """

    def __init__(self, pull_weight=0.25, push_weight=0.25, **kw):
        self.pull_weight = pull_weight
        self.push_weight = push_weight

    def __call__(self, tl_emb, br_emb, valid, **kw):
        """tl_emb, br_emb: (G,) corner embeddings per gt; valid: (G,) bool."""
        v = valid.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(v), 1.0)
        mean = (tl_emb + br_emb) * 0.5
        pull = ((tl_emb - mean) ** 2 + (br_emb - mean) ** 2) * v
        pull = jnp.sum(pull) / n
        # push: pairwise margin between different objects' means
        d = jnp.abs(mean[:, None] - mean[None, :])
        pair = v[:, None] * v[None, :] * (1 - jnp.eye(v.shape[0]))
        push = jnp.sum(jnp.maximum(1 - d, 0) * pair) / jnp.maximum(
            n * (n - 1), 1.0)
        return self.pull_weight * pull, self.push_weight * push
