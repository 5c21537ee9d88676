"""Core loss primitives (pure jnp, static-shape, mask-weighted).

Mirrors the reference's stock loss surface (mmdet/models/losses/): CE/BCE,
SmoothL1/L1, focal, IoU-family, accuracy, plus the ``weight_reduce_loss``
reduction contract (mmdet/models/losses/utils.py) that every mmdet loss
follows: elementwise loss * weight, then mean/sum, optionally divided by an
explicit ``avg_factor``.

The reference's ragged indexing (``pred[pos_inds]``) becomes masked
arithmetic here — every op keeps static shapes for XLA.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES


def weight_reduce_loss(loss, weight=None, reduction: str = "mean",
                       avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1e-12)
    return jnp.sum(loss) / avg_factor


def softmax_cross_entropy(logits, labels, ignore_index: int = -100):
    """Per-row CE with integer labels; rows with ignore_index give 0."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0)


def binary_cross_entropy_with_logits(logits, targets):
    """Elementwise BCE-with-logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def l1(pred, target):
    return jnp.abs(pred - target)


def sigmoid_focal_loss(logits, targets_onehot, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Elementwise focal loss (replaces mmcv CUDA sigmoid_focal_loss)."""
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy_with_logits(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    a_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return a_t * ce * (1 - p_t) ** gamma


def accuracy(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return 100.0 * jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return 100.0 * jnp.mean(correct)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Stock CE/BCE loss (reference mmdet/models/losses/cross_entropy_loss.py)."""

    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 class_weight=None, ignore_index=None, loss_weight=1.0, **kw):
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = -100 if ignore_index is None else ignore_index

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        if self.use_sigmoid:
            if cls_score.ndim != label.ndim:
                nc = cls_score.shape[-1]
                valid = (label >= 0) & (label != self.ignore_index)
                onehot = jax.nn.one_hot(jnp.where(label < nc, label, -1), nc)
                loss = binary_cross_entropy_with_logits(cls_score, onehot)
                w = valid[..., None].astype(jnp.float32)
                if weight is not None:
                    w = w * weight[..., None]
                return self.loss_weight * weight_reduce_loss(loss, w, red, avg_factor)
            loss = binary_cross_entropy_with_logits(cls_score, label)
        else:
            loss = softmax_cross_entropy(cls_score, label, self.ignore_index)
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0, **kw):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        loss = smooth_l1(pred, target, self.beta)
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction="mean", loss_weight=1.0, **kw):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(l1(pred, target), weight,
                                                     red, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction="mean", loss_weight=1.0, **kw):
        assert use_sigmoid
        self.gamma, self.alpha = gamma, alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        nc = pred.shape[-1]
        onehot = jax.nn.one_hot(target, nc)          # bg label (=nc) -> zeros
        loss = sigmoid_focal_loss(pred, onehot, self.gamma, self.alpha)
        if weight is not None and weight.ndim + 1 == loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class IoULoss:
    def __init__(self, mode="log", eps=1e-6, reduction="mean", loss_weight=1.0,
                 linear=False, **kw):
        self.mode = "linear" if linear else mode
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def _loss(self, ious):
        if self.mode == "linear":
            return 1 - ious
        if self.mode == "square":
            return 1 - ious ** 2
        return -jnp.log(jnp.maximum(ious, self.eps))

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        from ...core.bbox.geometry import bbox_overlaps
        red = reduction_override or self.reduction
        ious = bbox_overlaps(pred, target, is_aligned=True).clip(self.eps)
        loss = self._loss(ious)
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class BoundedIoULoss:
    """Bounded IoU loss (Tychsen-Smith & Petersson 2018; reference
    mmdet/models/losses/iou_loss.py bounded_iou_loss): per-side bounded
    IoU-like terms on center offsets and size ratios, combined with a
    smooth-L1 transition at ``beta``. Targets are stop-gradiented as in
    the reference (torch.no_grad on the target decomposition)."""

    def __init__(self, beta=0.2, eps=1e-3, reduction="mean",
                 loss_weight=1.0, **kw):
        self.beta = beta
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        eps = self.eps
        pcx = (pred[:, 0] + pred[:, 2]) * 0.5
        pcy = (pred[:, 1] + pred[:, 3]) * 0.5
        pw = pred[:, 2] - pred[:, 0]
        ph = pred[:, 3] - pred[:, 1]
        t = jax.lax.stop_gradient(target)
        tcx = (t[:, 0] + t[:, 2]) * 0.5
        tcy = (t[:, 1] + t[:, 3]) * 0.5
        tw = t[:, 2] - t[:, 0]
        th = t[:, 3] - t[:, 1]
        dx = tcx - pcx
        dy = tcy - pcy
        loss_dx = 1 - jnp.maximum(
            (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0.0)
        loss_dy = 1 - jnp.maximum(
            (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0.0)
        loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
        loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
        comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
        loss = jnp.where(comb < self.beta,
                         0.5 * comb * comb / self.beta,
                         comb - 0.5 * self.beta)
        loss = jnp.sum(loss, axis=-1)
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, red,
                                                     avg_factor)


@LOSSES.register_module()
class GIoULoss(IoULoss):
    def __init__(self, eps=1e-6, reduction="mean", loss_weight=1.0, **kw):
        super().__init__(eps=eps, reduction=reduction, loss_weight=loss_weight)

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        from ...core.bbox.geometry import bbox_overlaps
        red = reduction_override or self.reduction
        gious = bbox_overlaps(pred, target, mode="giou", is_aligned=True)
        loss = 1 - gious
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction="mean", loss_weight=1.0, **kw):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            (pred - target) ** 2, weight, red, avg_factor)


@LOSSES.register_module()
class BalancedL1Loss:
    """Libra R-CNN balanced L1 (reference mmdet/models/losses/balanced_l1_loss.py)."""

    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction="mean",
                 loss_weight=1.0, **kw):
        self.alpha, self.gamma, self.beta = alpha, gamma, beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        a, g, b = self.alpha, self.gamma, self.beta
        diff = jnp.abs(pred - target)
        bc = jnp.e ** (g / a) - 1
        loss = jnp.where(
            diff < b,
            a / bc * (bc * diff + b) * jnp.log(bc * diff / b + 1) - a * diff,
            g * diff + g / bc - a * b)
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class GHMC:
    """Gradient-harmonized classification loss (reference
    mmdet/models/losses/ghm_loss.py:31). The reference keeps a momentum
    buffer of bin counts (stateful); here the per-batch histogram is used
    directly (momentum=0 semantics) so the loss stays a pure function for
    jit — documented divergence.
    """

    def __init__(self, bins=10, momentum=0.0, use_sigmoid=True,
                 loss_weight=1.0, **kw):
        assert use_sigmoid
        self.bins = bins
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].add(1e-6)

    def __call__(self, pred, target, label_weight=None, avg_factor=None, **kw):
        """pred (N,C) logits, target (N,C) binary, label_weight (N,C)."""
        if label_weight is None:
            label_weight = jnp.ones_like(pred)
        valid = label_weight > 0
        g = jnp.abs(jax.nn.sigmoid(pred) - target)          # gradient norm
        tot = jnp.maximum(jnp.sum(valid), 1.0)
        weights = jnp.zeros_like(pred)
        for i in range(self.bins):
            inds = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            num_in_bin = jnp.sum(inds)
            # GD(g) density weighting: tot / num_in_bin for occupied bins
            weights = jnp.where(inds & (num_in_bin > 0),
                                tot / jnp.maximum(num_in_bin, 1.0), weights)
        occ = sum(jnp.any((g >= self.edges[i]) & (g < self.edges[i + 1]) & valid)
                  for i in range(self.bins)).astype(jnp.float32)
        weights = weights / jnp.maximum(occ, 1.0)
        loss = binary_cross_entropy_with_logits(pred, target) * weights
        return self.loss_weight * jnp.sum(loss) / tot


@LOSSES.register_module()
class GHMR:
    """Gradient-harmonized regression loss (reference ghm_loss.py:124),
    authentic smooth-L1-like ASL1 base; same momentum=0 note as GHMC."""

    def __init__(self, mu=0.02, bins=10, momentum=0.0, loss_weight=1.0, **kw):
        self.mu = mu
        self.bins = bins
        self.loss_weight = loss_weight
        self.edges = jnp.asarray(
            [i / bins for i in range(bins + 1)]).at[-1].set(1e3)

    def __call__(self, pred, target, label_weight=None, avg_factor=None, **kw):
        if label_weight is None:
            label_weight = jnp.ones_like(pred)
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu           # ASL1
        g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
        valid = label_weight > 0
        tot = jnp.maximum(jnp.sum(valid), 1.0)
        weights = jnp.zeros_like(g)
        for i in range(self.bins):
            inds = (g >= self.edges[i]) & (g < self.edges[i + 1]) & valid
            num_in_bin = jnp.sum(inds)
            weights = jnp.where(inds & (num_in_bin > 0),
                                tot / jnp.maximum(num_in_bin, 1.0), weights)
        occ = sum(jnp.any((g >= self.edges[i]) & (g < self.edges[i + 1]) & valid)
                  for i in range(self.bins)).astype(jnp.float32)
        weights = weights / jnp.maximum(occ, 1.0)
        return self.loss_weight * jnp.sum(loss * weights) / tot


@LOSSES.register_module()
class DiceLoss:
    """Dice loss for mask prediction (reference mmdet/models/losses/dice_loss.py)."""

    def __init__(self, use_sigmoid=True, activate=True, reduction="mean",
                 naive_dice=False, loss_weight=1.0, eps=1e-3, **kw):
        self.use_sigmoid = use_sigmoid
        self.activate = activate
        self.reduction = reduction
        self.naive_dice = naive_dice
        self.loss_weight = loss_weight
        self.eps = eps

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        if self.activate and self.use_sigmoid:
            pred = jax.nn.sigmoid(pred)
        p = pred.reshape(pred.shape[0], -1)
        t = target.reshape(target.shape[0], -1).astype(p.dtype)
        a = jnp.sum(p * t, axis=1)
        if self.naive_dice:
            b, c = jnp.sum(p, axis=1), jnp.sum(t, axis=1)
            d = (2 * a + self.eps) / (b + c + self.eps)
        else:
            b = jnp.sum(p * p, axis=1) + self.eps
            c = jnp.sum(t * t, axis=1) + self.eps
            d = (2 * a + self.eps) / (b + c)
        return self.loss_weight * weight_reduce_loss(1 - d, weight, red,
                                                     avg_factor)


@LOSSES.register_module()
class QualityFocalLoss:
    """GFL quality focal loss (reference mmdet/models/losses/gfocal_loss.py:45):
    soft IoU-quality targets with |target - sigma|^beta modulation."""

    def __init__(self, use_sigmoid=True, beta=2.0, reduction="mean",
                 loss_weight=1.0, **kw):
        assert use_sigmoid
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        """pred (N,C) logits; target = (labels (N,), scores (N,))."""
        red = reduction_override or self.reduction
        labels, scores = target
        nc = pred.shape[-1]
        sig = jax.nn.sigmoid(pred)
        # negatives: target 0 everywhere, modulator sigma^beta
        zeros = jnp.zeros_like(pred)
        loss = binary_cross_entropy_with_logits(pred, zeros) * sig ** self.beta
        # positives: at the label column, soft target=score
        pos = labels < nc
        onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), nc)
        soft = onehot * scores[..., None]
        mod = jnp.abs(soft - sig) ** self.beta
        pos_loss = binary_cross_entropy_with_logits(pred, soft) * mod
        loss = jnp.where((onehot > 0) & pos[..., None], pos_loss, loss)
        loss = jnp.sum(loss, axis=-1)
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class DistributionFocalLoss:
    """GFL distribution focal loss (reference gfocal_loss.py:93): CE against
    the two integer bins bracketing a continuous regression target."""

    def __init__(self, reduction="mean", loss_weight=1.0, **kw):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, label, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        dl = jnp.floor(label).astype(jnp.int32)
        dr = dl + 1
        wl = dr.astype(pred.dtype) - label
        wr = label - dl.astype(pred.dtype)
        logp = jax.nn.log_softmax(pred, axis=-1)
        nc = pred.shape[-1]
        ll = -jnp.take_along_axis(logp, jnp.clip(dl, 0, nc - 1)[..., None], -1)[..., 0]
        lr = -jnp.take_along_axis(logp, jnp.clip(dr, 0, nc - 1)[..., None], -1)[..., 0]
        loss = ll * wl + lr * wr
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


@LOSSES.register_module()
class GaussianFocalLoss:
    """CenterNet-style focal loss on gaussian heatmaps (reference
    mmdet/models/losses/gaussian_focal_loss.py)."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction="mean",
                 loss_weight=1.0, **kw):
        self.alpha, self.gamma = alpha, gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, gaussian_target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        red = reduction_override or self.reduction
        eps = 1e-12
        pos = (gaussian_target == 1).astype(pred.dtype)
        neg_w = (1 - gaussian_target) ** self.gamma
        loss = (-jnp.log(pred + eps) * (1 - pred) ** self.alpha * pos
                - jnp.log(1 - pred + eps) * pred ** self.alpha
                * neg_w * (1 - pos))
        return self.loss_weight * weight_reduce_loss(loss, weight, red, avg_factor)


def _center_dist2_and_enclose(pred, target):
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    rho2 = (px - tx) ** 2 + (py - ty) ** 2
    ex1 = jnp.minimum(pred[..., 0], target[..., 0])
    ey1 = jnp.minimum(pred[..., 1], target[..., 1])
    ex2 = jnp.maximum(pred[..., 2], target[..., 2])
    ey2 = jnp.maximum(pred[..., 3], target[..., 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    return rho2, jnp.maximum(c2, 1e-6)


@LOSSES.register_module()
class DIoULoss:
    """Distance-IoU loss (reference mmdet/models/losses/iou_loss.py DIoULoss)."""

    def __init__(self, eps=1e-6, reduction="mean", loss_weight=1.0, **kw):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        from ...core.bbox.geometry import bbox_overlaps
        red = reduction_override or self.reduction
        ious = bbox_overlaps(pred, target, is_aligned=True)
        rho2, c2 = _center_dist2_and_enclose(pred, target)
        loss = 1 - ious + rho2 / c2
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, red,
                                                     avg_factor)


@LOSSES.register_module()
class CIoULoss(DIoULoss):
    """Complete-IoU loss (reference iou_loss.py CIoULoss)."""

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kw):
        from ...core.bbox.geometry import bbox_overlaps
        red = reduction_override or self.reduction
        ious = bbox_overlaps(pred, target, is_aligned=True)
        rho2, c2 = _center_dist2_and_enclose(pred, target)
        pw = jnp.maximum(pred[..., 2] - pred[..., 0], 1e-6)
        ph = jnp.maximum(pred[..., 3] - pred[..., 1], 1e-6)
        tw = jnp.maximum(target[..., 2] - target[..., 0], 1e-6)
        th = jnp.maximum(target[..., 3] - target[..., 1], 1e-6)
        v = (4 / jnp.pi ** 2) * (jnp.arctan(tw / th)
                                 - jnp.arctan(pw / ph)) ** 2
        alpha = v / jnp.maximum(1 - ious + v, 1e-6)
        loss = 1 - ious + rho2 / c2 + jax.lax.stop_gradient(alpha) * v
        if weight is not None and weight.ndim > loss.ndim:
            weight = weight[..., 0]
        return self.loss_weight * weight_reduce_loss(loss, weight, red,
                                                     avg_factor)
