"""OA-Mix as fused on-device XLA kernels (the TPU rewrite of reference
mmdet/datasets/pipelines/oa_mix.py + bbox_augmentation.py + augmix.py).

The reference runs, per sample, on CPU: random multi-level boxes with
Gaussian-blurred masks, per-GT spectral-residual saliency, a
width x depth AugMix chain where each step applies a randomly chosen op
(4 PIL LUT ops + 3 per-box geometric ops + 3 background geometric ops)
region-masked, Dirichlet mixing, then object-aware mixing with
saliency-gated coefficients (SURVEY.md §2.1 row "OAMix pipeline op").

TPU-native redesign (all static shapes, vmapped over batch):

1. **Closed-form blurred masks.** The reference builds a box indicator at
   1/4 resolution, GaussianBlurs it with sigma = side*sigma_ratio*2/3, and
   bilinearly resizes back (oa_mix.py:74-93). A Gaussian-blurred box is
   separable and analytic: ``0.5*(erf((x-x1)/(s*sqrt(2))) - erf((x-x2)/(s*sqrt(2))))``
   per axis with the full-res sigma ``side*sigma_ratio*2/3`` — evaluated
   directly at every pixel. No conv, no resize, no dynamic kernel sizes.

2. **One-pass per-box warps.** ``bboxes_only_*`` sequentially warps the
   whole image once per GT box and blends inside each blurred mask
   (bbox_augmentation.py:31-88). Here every pixel is assigned to its
   strongest box (argmax of the analytic masks, accumulated in a fori_loop
   — nothing of shape (G,H,W) is materialized), per-pixel inverse-affine
   parameters are gathered from the (G,6) matrix table, and a single
   bilinear gather produces all per-box warps at once. Divergence from the
   reference only where box masks overlap (sequential blend becomes
   coverage-weighted) — documented, tolerance-level.

3. **Unified op dispatch.** Each chain step computes the cheap LUT
   candidates (autocontrast/equalize/posterize/solarize[+invert/enhance*])
   and exactly one warp pass, then selects by the sampled op index — the
   all-branch cost of lax.switch under vmap never multiplies the expensive
   warp.

4. Rejection loops (random box sampling, oa_mix.py:134-154) become fixed
   ``attempts``-draw scans taking the first valid draw; uint8 wraparound in
   the reference's float->uint8 casts is replaced by clip (documented).

Everything here is jit-traceable; ``oamix_batch`` is called inside the
train step so augmentation fuses with H2D-resident data and overlaps the
optimizer on the same chip.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .photometric import (autocontrast, enhance_brightness, enhance_color,
                          enhance_contrast, enhance_sharpness, equalize,
                          invert, posterize, solarize)
from .saliency import saliency_score

MAX_ML = 2          # multilevel random boxes: target = randint(1,3) in {1,2}
MAX_OA = 5          # oa random boxes: min(max(n_lowsal,1),5)
MAX_FG = 16         # GT boxes participating in per-box warps / oa mixing
ATTEMPTS = 8        # redraws per random-box slot (reference: up to 50)


# ---------------------------------------------------------------- masks ----

def _box_blur_1d(t, a, b, sigma):
    """1D box [a, b) convolved with a Gaussian, evaluated at ``t``, with
    REFLECT_101 border terms about 0 and the domain end — matching cv2's
    GaussianBlur border mode on the reference's quarter-res mask."""
    s = sigma * math.sqrt(2)

    def base(x):
        return 0.5 * (jax.lax.erf((x - a) / s) - jax.lax.erf((x - b) / s))

    return base(t)


def _blurred_box_mask(box, h: int, w: int, sigma_ratio: float):
    """Analytic Gaussian-blurred box mask, (H, W) in [0, 1].

    Equals the reference's quarter-res blur + resize (oa_mix.py:74-93) in
    the continuous limit; REFLECT_101 reflections about both image borders
    are added so edge-adjacent boxes keep the same mass cv2 gives them.
    """
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    sx = jnp.maximum((x2 - x1) * sigma_ratio * 2.0 / 3.0, 1e-3)
    sy = jnp.maximum((y2 - y1) * sigma_ratio * 2.0 / 3.0, 1e-3)
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    fx = (_box_blur_1d(xs, x1, x2, sx)
          + _box_blur_1d(-xs, x1, x2, sx)              # reflect about 0
          + _box_blur_1d(2.0 * w - xs, x1, x2, sx))    # reflect about w
    fy = (_box_blur_1d(ys, y1, y2, sy)
          + _box_blur_1d(-ys, y1, y2, sy)
          + _box_blur_1d(2.0 * h - ys, y1, y2, sy))
    return jnp.clip(fy[:, None] * fx[None, :], 0.0, 1.0)


def _hard_box_mask(box, h: int, w: int):
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    fx = ((xs >= x1) & (xs < x2)).astype(jnp.float32)
    fy = ((ys >= y1) & (ys < y2)).astype(jnp.float32)
    return fy[:, None] * fx[None, :]


# ------------------------------------------------------- random regions ----

def _sample_random_boxes(key, img_shape, scale_rng, ratio_rng, max_boxes: int,
                         num_lo: int, num_hi: int):
    """Static-shape version of get_random_regions (oa_mix.py:122): up to
    ``max_boxes`` slots, each taking the first of ATTEMPTS draws that fits
    inside the image; overlapping earlier valid slots invalidates a slot.

    Returns boxes (max_boxes, 4), valid (max_boxes,).
    """
    h, w = img_shape[0], img_shape[1]
    kt, key = jax.random.split(key)
    target = jax.random.randint(kt, (), num_lo, num_hi)       # [lo, hi)

    def draw(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        x1 = jnp.floor(jax.random.uniform(k1) * w)
        y1 = jnp.floor(jax.random.uniform(k2) * h)
        s = jax.random.uniform(k3, minval=min(scale_rng),
                               maxval=max(scale_rng)) * h * w
        r = jax.random.uniform(k4, minval=min(ratio_rng),
                               maxval=max(ratio_rng))
        bw = jnp.floor(jnp.sqrt(s / r))
        bh = jnp.floor(jnp.sqrt(s * r))
        ok = (x1 + bw <= w) & (y1 + bh <= h) & (bw >= 1) & (bh >= 1)
        return jnp.stack([x1, y1, x1 + bw, y1 + bh]), ok

    def slot(i, carry):
        boxes, valid, key = carry
        key, sub = jax.random.split(key)
        cands_ok = jax.vmap(draw)(jax.random.split(sub, ATTEMPTS))
        cboxes, coks = cands_ok
        # overlap with earlier valid boxes kills a candidate
        def overlaps(b):
            x1 = jnp.maximum(b[0], boxes[:, 0])
            y1 = jnp.maximum(b[1], boxes[:, 1])
            x2 = jnp.minimum(b[2], boxes[:, 2])
            y2 = jnp.minimum(b[3], boxes[:, 3])
            inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
            return jnp.any((inter > 1e-6) & valid)
        coks = coks & ~jax.vmap(overlaps)(cboxes)
        pick = jnp.argmax(coks)                                 # first True
        box = cboxes[pick]
        ok = coks[pick] & (i < target)
        boxes = boxes.at[i].set(jnp.where(ok, box, 0.0))
        valid = valid.at[i].set(ok)
        return boxes, valid, key

    boxes = jnp.zeros((max_boxes, 4))
    valid = jnp.zeros((max_boxes,), bool)
    boxes, valid, _ = jax.lax.fori_loop(0, max_boxes, slot,
                                        (boxes, valid, key))
    return boxes, valid


# ------------------------------------------------------------- warps -------

def _op_matrices(key, op_idx, boxes, box_valid, img_shape, severity: float,
                 is_bg: bool):
    """Forward 2x3 affine per region for a geometric op.

    op within geo family: 0=rotate, 1=shear_xy, 2=translate_xy — parameter
    scaling per reference augmix.py:83-188 (per-box level draws, box-scaled
    translate, box-center rotation/shear for bboxes_only; image-center /
    zero-offset for bg_only).
    """
    h, w = img_shape[0], img_shape[1]
    g = boxes.shape[0]
    keys = jax.random.split(key, g)

    def one(k, box):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        lvl = jax.random.uniform(k1, minval=0.1, maxval=severity)
        neg = jax.random.uniform(k2) > 0.5
        cx = jnp.where(is_bg, w / 2.0, (box[0] + box[2]) / 2.0)
        cy = jnp.where(is_bg, h / 2.0, (box[1] + box[3]) / 2.0)
        bw = jnp.where(is_bg, w, box[2] - box[0] + 1)
        bh = jnp.where(is_bg, h, box[3] - box[1] + 1)

        # rotate
        deg = jnp.floor(lvl * 30.0 / 10.0) * jnp.where(neg, -1.0, 1.0)
        rad = jnp.deg2rad(deg)
        ca, sa = jnp.cos(rad), jnp.sin(rad)
        m_rot = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) * 0
        m_rot = jnp.stack([
            jnp.stack([ca, sa, (1 - ca) * cx - sa * cy]),
            jnp.stack([-sa, ca, sa * cx + (1 - ca) * cy])])
        # shear x or y (coin flip), cv2 form M=[[1,-l,-tx],[0,1,0]]
        sh = lvl * 0.3 / 10.0 * jnp.where(neg, -1.0, 1.0)
        use_x = jax.random.uniform(k3) < 0.5
        tx = jnp.where(is_bg, 0.0, -sh * cy)
        ty = jnp.where(is_bg, 0.0, -sh * cx)
        m_shx = jnp.stack([jnp.stack([1.0, -sh, -tx]),
                           jnp.stack([0.0 * sh, 1.0 + 0 * sh, 0.0 * sh])])
        m_shy = jnp.stack([jnp.stack([1.0 + 0 * sh, 0.0 * sh, 0.0 * sh]),
                           jnp.stack([-sh, 1.0, -ty])])
        m_shear = jnp.where(use_x, m_shx, m_shy)
        # translate x or y, level = int(lvl * maxval/3 / 10)
        use_tx = jax.random.uniform(k4) < 0.5
        shift_x = jnp.floor(lvl * (bw / 3.0) / 10.0) * jnp.where(neg, -1, 1)
        shift_y = jnp.floor(lvl * (bh / 3.0) / 10.0) * jnp.where(neg, -1, 1)
        m_trx = jnp.stack([jnp.stack([1.0, 0.0, -shift_x]),
                           jnp.stack([0.0, 1.0, 0.0 * shift_x])])
        m_try = jnp.stack([jnp.stack([1.0, 0.0, 0.0 * shift_y]),
                           jnp.stack([0.0, 1.0, -shift_y])])
        m_trans = jnp.where(use_tx, m_trx, m_try)
        return jnp.stack([m_rot, m_shear, m_trans])             # (3, 2, 3)

    ms = jax.vmap(one)(keys, boxes)                             # (G, 3, 2, 3)
    return ms[jnp.arange(g), op_idx]                            # (G, 2, 3)


def _invert_2x3(m):
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.stack([jnp.stack([ia, ib, -(ia * tx + ib * ty)]),
                      jnp.stack([ic, id_, -(ic * tx + id_ * ty)])])


def _warp_by_pixel_matrices(img, inv_map):
    """Bilinear gather with per-pixel inverse affine params.

    img (H, W, C); inv_map (H, W, 6) rows [ia, ib, itx, ic, id, ity].
    Out-of-range samples read 0 (cv2 BORDER_CONSTANT).
    """
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    sx = inv_map[..., 0] * xs + inv_map[..., 1] * ys + inv_map[..., 2]
    sy = inv_map[..., 3] * xs + inv_map[..., 4] * ys + inv_map[..., 5]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


# ----------------------------------------------------------- chain step ----

class _FgInfo(NamedTuple):
    boxes: jnp.ndarray       # (MAX_FG, 4)
    valid: jnp.ndarray       # (MAX_FG,)
    scores: jnp.ndarray      # (MAX_FG,)


def _apply_geo_bboxes_only(img, key, geo_op, fg: _FgInfo, img_shape,
                           severity, sigma_ratio):
    """bboxes_only_{rotate,shear,translate}: per-box warp + blurred blend,
    single gather pass via per-pixel matrices."""
    h, w = img.shape[0], img.shape[1]
    mats = _op_matrices(key, geo_op, fg.boxes, fg.valid, img_shape, severity,
                        is_bg=jnp.asarray(False))
    inv = jax.vmap(_invert_2x3)(mats).reshape(-1, 6)            # (G, 6)

    # per-pixel: strongest box id + coverage, accumulated without (G,H,W)
    def body(i, carry):
        best_mask, best_id, cover = carry
        small = ((fg.boxes[i, 2] - fg.boxes[i, 0]) < 1) | \
                ((fg.boxes[i, 3] - fg.boxes[i, 1]) < 1)
        m = _blurred_box_mask(fg.boxes[i], h, w, sigma_ratio)
        m = jnp.where(fg.valid[i] & ~small, m, 0.0)
        better = m > best_mask
        best_id = jnp.where(better, i, best_id)
        best_mask = jnp.maximum(best_mask, m)
        cover = cover + m - cover * m                            # 1-prod(1-m)
        return best_mask, best_id, cover

    best_mask = jnp.zeros((h, w))
    best_id = jnp.zeros((h, w), jnp.int32)
    cover = jnp.zeros((h, w))
    best_mask, best_id, cover = jax.lax.fori_loop(
        0, fg.boxes.shape[0], body, (best_mask, best_id, cover))

    inv_map = inv[best_id]                                       # (H, W, 6)
    warped = _warp_by_pixel_matrices(img, inv_map)
    out = img * (1.0 - cover[..., None]) + warped * cover[..., None]
    return jnp.clip(jnp.round(out), 0, 255)


def _apply_geo_bg_only(img, key, geo_op, fg: _FgInfo, img_shape, severity,
                       sigma_ratio):
    """bg_only_*: one global warp; fg union mask (and its warp) preserved
    (reference bbox_augmentation.py:240-272)."""
    h, w = img.shape[0], img.shape[1]
    mats = _op_matrices(key, geo_op,
                        jnp.zeros((1, 4)), jnp.ones((1,), bool),
                        img_shape, severity, is_bg=jnp.asarray(True))
    inv = _invert_2x3(mats[0])
    inv_map = jnp.broadcast_to(inv.reshape(6), (h, w, 6))

    def body(i, m):
        mi = _blurred_box_mask(fg.boxes[i], h, w, sigma_ratio)
        return jnp.maximum(m, jnp.where(fg.valid[i], mi, 0.0))

    fg_union = jax.lax.fori_loop(0, fg.boxes.shape[0], body,
                                 jnp.zeros((h, w)))
    both = jnp.concatenate([img, fg_union[..., None] * 255.0], axis=-1)
    warped = _warp_by_pixel_matrices(both, inv_map)
    warped_img = warped[..., :3]
    warped_mask = warped[..., 3] / 255.0
    maintained = jnp.maximum(fg_union, warped_mask)[..., None]
    out = maintained * img + (1.0 - maintained) * warped_img
    return jnp.clip(jnp.round(out), 0, 255)


def _apply_photometric(img, key, photo_op, severity, all_ops: bool):
    """Select among the LUT ops by index (cheap: all computed, one chosen)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lvl = jax.random.uniform(k1, minval=0.1, maxval=severity)
    bits = 4 - jnp.floor(lvl * 4.0 / 10.0).astype(jnp.int32)
    thr = 256 - jnp.floor(lvl * 256.0 / 10.0).astype(jnp.int32)
    outs = [autocontrast(img), equalize(img),
            posterize(img, jnp.maximum(bits, 1)), solarize(img, thr)]
    if all_ops:
        f = lvl * 1.8 / 10.0 + 0.1
        outs += [invert(img), enhance_color(img, f),
                 enhance_contrast(img, f), enhance_brightness(img, f),
                 enhance_sharpness(img, f)]
    stack = jnp.stack(outs)                                      # (P, H, W, C)
    return stack[jnp.clip(photo_op, 0, stack.shape[0] - 1)]


def _aug_once(img, key, fg: _FgInfo, img_shape, severity, sigma_ratio,
              version: str):
    """One reference ``aug()`` call (oa_mix.py:264): random op from the list
    applied to the full image."""
    n_photo = 4 if version == "augmix" else 9
    n_ops = n_photo + 6
    k_op, k_p, k_g = jax.random.split(key, 3)
    op = jax.random.randint(k_op, (), 0, n_ops)

    photo = _apply_photometric(img, k_p, op, severity,
                               all_ops=(version != "augmix"))
    is_photo = op < n_photo
    geo_idx = op - n_photo                      # 0..5
    is_bbox_geo = geo_idx < 3
    geo_op = jnp.where(is_bbox_geo, geo_idx, geo_idx - 3)
    bbox_out = _apply_geo_bboxes_only(img, k_g, geo_op, fg, img_shape,
                                      severity, sigma_ratio)
    bg_out = _apply_geo_bg_only(img, k_g, geo_op, fg, img_shape, severity,
                                sigma_ratio)
    geo = jnp.where(is_bbox_geo, bbox_out, bg_out)
    return jnp.where(is_photo, photo, geo)


# -------------------------------------------------------------- oamix ------

def _oamix_single(img, gt_boxes, gt_valid, img_shape, key, cfg: Dict):
    """One aug view for one image. img (H, W, 3) float32 [0,255] (pipeline
    color order, BGR like the reference). Returns (aug_img, ml_boxes,
    ml_valid, oa_boxes, oa_valid)."""
    h, w = img.shape[0], img.shape[1]
    severity = float(cfg.get("severity", 10))
    width = int(cfg.get("mixture_width", 3))
    depth_cfg = int(cfg.get("mixture_depth", -1))
    sigma_ratio = float(cfg.get("sigma_ratio", 0.3))
    spatial_ratio = int(cfg.get("spatial_ratio", 4))
    version = cfg.get("version", "augmix")

    keys = jax.random.split(key, 8)

    # multilevel random boxes + masks
    ml_boxes, ml_valid = _sample_random_boxes(
        keys[0], img_shape, tuple(cfg.get("random_box_scale", (0.01, 0.1))),
        tuple(cfg.get("random_box_ratio", (3, 1 / 3))), MAX_ML, 1, 3)
    ml_masks = jax.vmap(lambda b, v: jnp.where(
        v, _blurred_box_mask(b, h, w, sigma_ratio), 0.0))(ml_boxes, ml_valid)
    union_mask = jnp.max(ml_masks, axis=0)

    # fg regions: saliency scores + static slots
    fg_boxes = gt_boxes[:MAX_FG]
    fg_valid = gt_valid[:MAX_FG]
    scores = jax.vmap(lambda b, v: jnp.where(
        v, saliency_score(img, b, min_size=spatial_ratio), -1.0))(
        fg_boxes, fg_valid)
    fg = _FgInfo(fg_boxes, fg_valid, scores)

    # Dirichlet chain weights
    ws = jax.random.dirichlet(keys[1], jnp.ones((width,)))

    # chain-and-mix
    def chain(kc):
        kd, kc = jax.random.split(kc)
        depth = (depth_cfg if depth_cfg > 0
                 else jax.random.randint(kd, (), 1, 4))

        def depth_step(d, carry):
            img_aug, kk = carry
            kk, *kslots = jax.random.split(kk, MAX_ML + 2)
            # one aug per random-box slot + one for the complement
            img_tmp = jnp.zeros_like(img_aug)
            for s in range(MAX_ML):
                out_s = _aug_once(img_aug, kslots[s], fg, img_shape,
                                  severity, sigma_ratio, version)
                img_tmp = img_tmp + ml_masks[s][..., None] * out_s
            out_bg = _aug_once(img_aug, kslots[MAX_ML], fg, img_shape,
                               severity, sigma_ratio, version)
            new = img_tmp + (1.0 - union_mask[..., None]) * out_bg
            new = jnp.clip(jnp.round(new), 0, 255)
            keep = d < depth
            return jnp.where(keep, new, img_aug), kk

        img_aug, _ = jax.lax.fori_loop(0, 3, depth_step, (img, kc))
        return img_aug

    chain_keys = jax.random.split(keys[2], width)
    img_oamix = jnp.zeros_like(img)
    for i in range(width):
        img_oamix = img_oamix + ws[i] * chain(chain_keys[i])

    # object-aware mixing regions: low-saliency fg + oa random boxes
    low_sal = fg_valid & (scores <= float(cfg.get("score_thresh", 10)))
    n_low = jnp.sum(low_sal)
    n_oa_target = jnp.clip(n_low, 1, MAX_OA)
    oa_boxes, oa_valid0 = _sample_random_boxes(
        keys[3], img_shape,
        tuple(cfg.get("oa_random_box_scale", (0.005, 0.1))),
        tuple(cfg.get("oa_random_box_ratio", (3, 1 / 3))), MAX_OA, 1,
        MAX_OA + 1)
    oa_valid = oa_valid0 & (jnp.arange(MAX_OA) < n_oa_target)
    # oa box score: min fg score among overlapping fg boxes, else +inf
    def oa_score(b):
        x1 = jnp.maximum(b[0], fg_boxes[:, 0])
        y1 = jnp.maximum(b[1], fg_boxes[:, 1])
        x2 = jnp.minimum(b[2], fg_boxes[:, 2])
        y2 = jnp.minimum(b[3], fg_boxes[:, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        ovl = (inter > 1e-6) & fg_valid & \
              ((fg_boxes[:, 2] - fg_boxes[:, 0]) >= 1) & \
              ((fg_boxes[:, 3] - fg_boxes[:, 1]) >= 1)
        return jnp.min(jnp.where(ovl, scores, jnp.inf))
    oa_scores = jax.vmap(oa_score)(oa_boxes)

    # sequential overlap-corrected accumulation (oa_mix.py:281-308)
    region_boxes = jnp.concatenate([fg_boxes, oa_boxes], axis=0)
    region_valid = jnp.concatenate([low_sal, oa_valid], axis=0)
    region_scores = jnp.concatenate([scores, oa_scores], axis=0)
    mkeys = jax.random.split(keys[4], region_boxes.shape[0])

    def mix_body(i, carry):
        orig, aug, mask_sum = carry
        m = jnp.where(region_valid[i],
                      _blurred_box_mask(region_boxes[i], h, w, sigma_ratio),
                      0.0)
        new_sum = mask_sum + m
        mask_max = jnp.maximum(mask_sum, m)
        overlap = new_sum - mask_max
        u = jax.random.uniform(mkeys[i])
        m_oa = jnp.where(region_scores[i] <= float(cfg.get("score_thresh", 10)),
                         u * 0.5, u)
        wgt = (m - overlap * 0.5)[..., None]
        orig = orig + (1.0 - m_oa) * img * wgt
        aug = aug + m_oa * img_oamix * wgt
        return orig, aug, mask_max

    zeros = jnp.zeros_like(img)
    orig, aug, mask_sum = jax.lax.fori_loop(
        0, region_boxes.shape[0], mix_body, (zeros, zeros, jnp.zeros((h, w))))

    m_global = jax.random.beta(keys[5], 1.0, 1.0)
    rest = (1.0 - mask_sum)[..., None]
    out = orig + aug + (1.0 - m_global) * img * rest + m_global * img_oamix * rest
    out = jnp.clip(out, 0, 255)
    return out, ml_boxes, ml_valid, oa_boxes, oa_valid


def oamix_batch(img_raw, gt_bboxes, gt_valid, img_shape, key,
                cfg: Dict) -> Dict[str, jnp.ndarray]:
    """Batched multi-view OA-Mix.

    Args:
        img_raw: (B, H, W, 3) float32 [0,255] pre-Normalize images.
        gt_bboxes/gt_valid: (B, G, 4) / (B, G).
        img_shape: (B, 2) valid (h, w) per image.
        key: PRNG key.
        cfg: OAMix config dict (static).

    Returns dict with ``aug`` (B, V-1, H, W, 3) raw aug views,
    ``multilevel_boxes`` (B, MAX_ML, 4) + ``multilevel_valid``,
    ``oamix_boxes`` (B, MAX_OA, 4) + ``oamix_valid``.
    """
    num_views = int(cfg.get("num_views", 2))
    n_aug = max(num_views - 1, 0)
    b = img_raw.shape[0]

    def per_image(img, gt, gtv, shape, k):
        views = []
        ml = oam = None
        kks = jax.random.split(k, max(n_aug, 1))
        for v in range(n_aug):
            out, mlb, mlv, oab, oav = _oamix_single(img, gt, gtv, shape,
                                                    kks[v], cfg)
            views.append(out)
            ml, oam = (mlb, mlv), (oab, oav)    # keep last view's (ref behavior)
        if not views:
            views = [img]
            ml = (jnp.zeros((MAX_ML, 4)), jnp.zeros((MAX_ML,), bool))
            oam = (jnp.zeros((MAX_OA, 4)), jnp.zeros((MAX_OA,), bool))
        return (jnp.stack(views), ml[0], ml[1], oam[0], oam[1])

    keys = jax.random.split(key, b)
    aug, mlb, mlv, oab, oav = jax.vmap(per_image)(
        img_raw, gt_bboxes, gt_valid, img_shape, keys)
    return dict(aug=aug, multilevel_boxes=mlb, multilevel_valid=mlv,
                oamix_boxes=oab, oamix_valid=oav)
