"""OA-Loss unit tests: view-chunked losses, JSD, supcontrast vs a direct
dense (reference-style) numpy implementation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.models.losses.common import weight_reduce_loss
from oadg_tpu.models.losses.oadg import (CrossEntropyLossPlus, L1LossPlus,
                                         SmoothL1LossPlus, jsd_consistency,
                                         supcontrast)

RNG = np.random.RandomState(0)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_jsd_matches_direct_formula_softmax():
    n, c, v = 12, 5, 2
    pred = RNG.randn(v * n, c).astype(np.float32)
    af = 7.0
    ours = float(jsd_consistency(jnp.asarray(pred), v, af))
    p1, p2 = softmax(pred[:n]), softmax(pred[n:])
    mix = np.clip((p1 + p2) / 2, 1e-7, 1.0)
    kl = lambda p: np.sum(p * (np.log(p + 1e-12) - np.log(mix)))
    ref = (kl(p1) + kl(p2)) / 2 / af
    assert ours == pytest.approx(ref, rel=1e-4)


def test_jsd_sigmoid_single_logit():
    n, v = 9, 3
    pred = RNG.randn(v * n, 1).astype(np.float32)
    ours = float(jsd_consistency(jnp.asarray(pred), v, 1.0))
    sig = 1 / (1 + np.exp(-pred))
    ps = [np.concatenate([sig[i * n:(i + 1) * n],
                          1 - sig[i * n:(i + 1) * n]], -1) for i in range(v)]
    mix = np.clip(sum(ps) / v, 1e-7, 1.0)
    ref = sum(np.sum(p * (np.log(p + 1e-12) - np.log(mix))) for p in ps) / v
    assert ours == pytest.approx(ref, rel=1e-4)


def test_ce_plus_trains_view1_only():
    n, c, v = 8, 4, 2
    pred = RNG.randn(v * n, c).astype(np.float32)
    labels = RNG.randint(0, c, v * n)
    w = np.ones(v * n, np.float32)
    loss_fn = CrossEntropyLossPlus(use_sigmoid=False, num_views=v,
                                   additional_loss="None")
    base = float(loss_fn(jnp.asarray(pred), jnp.asarray(labels),
                         jnp.asarray(w), avg_factor=float(v * n)))
    # perturbing the view-2 chunk must not change the loss
    pred2 = pred.copy()
    pred2[n:] += RNG.randn(n, c)
    pert = float(loss_fn(jnp.asarray(pred2), jnp.asarray(labels),
                         jnp.asarray(w), avg_factor=float(v * n)))
    assert base == pytest.approx(pert, abs=1e-6)
    # view-1 CE formula check
    p = softmax(pred[:n])
    ref = -np.mean(np.log(p[np.arange(n), labels[:n]])) * n / (v * n)
    assert base == pytest.approx(ref, rel=1e-5)


def test_reg_plus_view1_only():
    n, v = 6, 2
    pred = RNG.randn(v * n, 4).astype(np.float32)
    tgt = RNG.randn(v * n, 4).astype(np.float32)
    w = np.ones((v * n, 4), np.float32)
    for cls, ref_fn in [(SmoothL1LossPlus, None), (L1LossPlus, None)]:
        loss_fn = cls(num_views=v, additional_loss="None")
        base = float(loss_fn(jnp.asarray(pred), jnp.asarray(tgt),
                             jnp.asarray(w), avg_factor=float(v * n)))
        pred2 = pred.copy()
        pred2[n:] += 5.0
        pert = float(loss_fn(jnp.asarray(pred2), jnp.asarray(tgt),
                             jnp.asarray(w), avg_factor=float(v * n)))
        assert base == pytest.approx(pert, abs=1e-6)


def _supcontrast_dense_np(feats, labels, r, v, p, temper):
    """Reference-style dense implementation (contrastive_loss.py:147-232)."""
    n = len(feats)
    x = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True),
                           1e-12)
    bg = labels.max()
    fg = labels != bg
    same_inst = np.zeros((n, n), bool)
    eye_r = np.eye(r, dtype=bool)
    same_inst[:r, r:2 * r] = eye_r
    same_inst[r:2 * r, :r] = eye_r
    if p:
        eye_p = np.eye(p, dtype=bool)
        same_inst[2 * r:2 * r + p, 2 * r + p:2 * r + 2 * p] = eye_p
        same_inst[2 * r + p:2 * r + 2 * p, 2 * r:2 * r + p] = eye_p
    bgm = ~fg
    mask_anchor_bg = same_inst & bgm[:, None] & bgm[None, :]
    eye = np.eye(n, dtype=bool)
    mask_fg = (labels[:, None] == labels[None, :]) & ~eye & \
        fg[:, None] & fg[None, :]
    mask_anchor = (mask_fg | mask_anchor_bg).astype(np.float64)
    mask_contrast = (~eye).astype(np.float64)
    logits = x @ x.T / temper
    logits = logits - (np.where(mask_contrast > 0, logits, -np.inf)
                       .max(axis=1, keepdims=True))
    ez = np.exp(logits) * mask_contrast
    logp = logits - np.log(ez.sum(1, keepdims=True))
    mean_pos = (mask_anchor * logp).sum(1) / (mask_anchor.sum(1) + 1e-8)
    return float(np.mean(-mean_pos))


def test_supcontrast_matches_dense_reference():
    r, v, p = 10, 2, 3
    n = r * v + p * v
    feats = RNG.randn(n, 16).astype(np.float32)
    # labels: fg classes 0..2, bg = 3; random proposals all bg
    labels = RNG.randint(0, 4, n).astype(np.int32)
    labels[2 * r:] = 3
    valid = np.ones(n, bool)
    ours = float(supcontrast(jnp.asarray(feats), jnp.asarray(labels),
                             jnp.asarray(valid), (r, v, p), temper=0.06,
                             min_samples=1))
    ref = _supcontrast_dense_np(feats.astype(np.float64), labels, r, v, p,
                                0.06)
    assert ours == pytest.approx(ref, rel=2e-3)


def test_supcontrast_zero_when_few_fg():
    r, v, p = 4, 2, 0
    n = r * v
    feats = RNG.randn(n, 8).astype(np.float32)
    labels = np.full(n, 5, np.int32)      # all background
    out = float(supcontrast(jnp.asarray(feats), jnp.asarray(labels),
                            jnp.ones(n, bool), (r, v, p), min_samples=2))
    assert out == 0.0
