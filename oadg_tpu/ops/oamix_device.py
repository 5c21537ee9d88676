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
import os as _os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .pallas_warp import (warp_rotate, warp_shear_x, warp_shear_y,
                          warp_translate_x, warp_translate_y)
from .photometric import (autocontrast, enhance_brightness, enhance_color,
                          enhance_contrast, enhance_sharpness, equalize,
                          invert, posterize, solarize)
from .saliency import saliency_score

MAX_ML = 2          # multilevel random boxes: target = randint(1,3) in {1,2}
MAX_OA = 5          # oa random boxes: min(max(n_lowsal,1),5)
MAX_FG = 16         # GT boxes participating in per-box warps / oa mixing
ATTEMPTS = 8        # redraws per random-box slot (reference: up to 50)


def _use_merged_chain() -> bool:
    # OAMIX_CHAIN=merged routes the chain through _depth_step_merged:
    # per-slot lax.cond + lax.switch dispatch replaced by ONE fused
    # photometric pass + a cond-GATED warp trio per geo-drawn slot.
    # History (v5e, chain A/B b=4 1024x2048, oadg 15-op version):
    # slots 88 ms; first merged form 132 ms (it paid all 9 warp passes
    # every depth step — unconditional lost); cond-gated merged 68 ms
    # (photo slots share one fused pass incl. a single equalize hist —
    # the costliest op at ~1.9 ms/exec in the slot dispatch — and only
    # geo-drawn slots run their trio, P(geo)=6/15 per slot). BUT inside
    # the full train step the gated-merged chain REGRESSES: full-bench
    # A/B 2026-08-20 measured slots 0.3265 s/step (12.25 samples/s) vs
    # merged 0.3722 (10.75) — the standalone 20 ms win inverts to a
    # 45 ms in-step loss (TPU conditionals are scheduling barriers; the
    # merged form's unconditional photo pass + per-depth any_eq/any_sharp
    # conds interact worse with the surrounding fwd/bwd than the slot
    # dispatch does). Default stays "slots"; merged remains the tested
    # equivalent (bit-equal under shared-draw injection —
    # tests/test_oamix_merged.py; production differs only by PRNG stream
    # assignment) for workloads where the chain runs standalone.
    return _os.environ.get("OAMIX_CHAIN", "slots") == "merged"


def _lane_dtype():
    """Chain-state lane dtype crossing every lax.cond/switch boundary.

    The chain state is integer-valued 0..255 after every op (each branch
    trunc/rounds), so uint8 represents it EXACTLY and quarters the f32
    boundary materialization bytes (the measured dominant chain cost).
    Branches upcast internally exactly as the bf16-lane form did, so all
    math — and therefore the golden/quantization pins — is bit-identical.
    OAMIX_LANES=bf16|f32 restores the wider lanes (A/B + debugging);
    OAMIX_F32_LANES=1 is kept as an alias for f32.
    """
    if _os.environ.get("OAMIX_F32_LANES"):
        return jnp.float32
    v = _os.environ.get("OAMIX_LANES", "u8")
    return {"f32": jnp.float32, "bf16": jnp.bfloat16,
            "u8": jnp.uint8}[v]


def _use_pw_geo() -> bool:
    # Route bboxes_only_* through the piecewise-shift Pallas kernel
    # (vs the per-pixel XLA gather path). Default ON for TPU since the
    # binary-decomposed-roll kernel + hoisted per-view prep measured
    # 0.525 s/step vs 0.827 on the flagship bench (OAMIX_GEO_PW=0 opts
    # back into the gather path; OAMIX_GEO_PW=force enables the pw MATH
    # on CPU too — its XLA fallback — so the quantization suite can pin
    # the production path's 3-shear/blend semantics off-chip).
    v = _os.environ.get("OAMIX_GEO_PW", "1")
    if v == "force":
        return True
    return jax.devices()[0].platform != "cpu" and v != "0"


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

    def draw_all(sub):
        u = jax.random.uniform(sub, (ATTEMPTS, 4))
        x1 = jnp.floor(u[:, 0] * w)
        y1 = jnp.floor(u[:, 1] * h)
        s = (min(scale_rng) + u[:, 2] * (max(scale_rng) - min(scale_rng))) * h * w
        r = min(ratio_rng) + u[:, 3] * (max(ratio_rng) - min(ratio_rng))
        bw = jnp.floor(jnp.sqrt(s / r))
        bh = jnp.floor(jnp.sqrt(s * r))
        ok = (x1 + bw <= w) & (y1 + bh <= h) & (bw >= 1) & (bh >= 1)
        return jnp.stack([x1, y1, x1 + bw, y1 + bh], -1), ok

    def slot(i, carry):
        boxes, valid, key = carry
        key, sub = jax.random.split(key)
        cboxes, coks = draw_all(sub)
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

def _op_matrices(key, family: int, boxes, box_valid, img_shape,
                 severity: float, is_bg: bool, inj=None):
    """Forward 2x3 affines for one geometric-op family, vectorized over
    boxes (scalar-granularity ops serialize badly on TPU, so all per-box
    quantities stay (G,) vectors and the RNG is one fused draw).

    ``family``: 0=rotate, 1=shear_xy, 2=translate_xy — parameter scaling per
    reference augmix.py:83-188 (per-box level draws, box-scaled translate,
    box-center rotation/shear for bboxes_only; image-center / zero-offset
    for bg_only).
    """
    h, w = img_shape[0], img_shape[1]
    g = boxes.shape[0]
    if inj is not None:          # shared-draw-table mode (parity tests)
        lvl = inj[0][:g]
        sign = inj[1][:g]
        use_x = inj[2] < 0.5
    else:
        u = jax.random.uniform(key, (g, 3))
        lvl = 0.1 + u[:, 0] * (severity - 0.1)
        sign = jnp.where(u[:, 1] > 0.5, -1.0, 1.0)
        # ONE axis coin per call (reference bbox_augmentation.py:103-104:
        # shear_xy picks shear_x or shear_y once, for every box);
        # magnitudes and signs stay per-box (sample_level runs per
        # aug_func call inside the per-box loop)
        use_x = u[0, 2] < 0.5

    if is_bg:
        cx = jnp.full((g,), w / 2.0)
        cy = jnp.full((g,), h / 2.0)
        bw = jnp.full((g,), w)
        bh = jnp.full((g,), h)
    else:
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        bw = boxes[:, 2] - boxes[:, 0] + 1
        bh = boxes[:, 3] - boxes[:, 1] + 1
    zeros = jnp.zeros((g,))
    ones = jnp.ones((g,))

    def assemble(a, b, c, d, e, f):
        # rows [[a, b, c], [d, e, f]] -> (G, 2, 3)
        return jnp.stack([jnp.stack([a, b, c], -1),
                          jnp.stack([d, e, f], -1)], -2)

    if family == 0:                 # rotate about (cx, cy)
        deg = jnp.floor(lvl * 30.0 / 10.0) * sign
        rad = jnp.deg2rad(deg)
        ca, sa = jnp.cos(rad), jnp.sin(rad)
        return assemble(ca, sa, (1 - ca) * cx - sa * cy,
                        -sa, ca, sa * cx + (1 - ca) * cy)
    if family == 1:                 # shear x or y (cv2 M=[[1,-l,-tx],[0,1,0]])
        sh = lvl * 0.3 / 10.0 * sign
        tx = zeros if is_bg else -sh * cy
        ty = zeros if is_bg else -sh * cx
        m_shx = assemble(ones, -sh, -tx, zeros, ones, zeros)
        m_shy = assemble(ones, zeros, zeros, -sh, ones, -ty)
        return jnp.where(use_x, m_shx, m_shy)
    # translate x or y, level = int(lvl * maxval/3 / 10)
    shift_x = jnp.floor(lvl * (bw / 3.0) / 10.0) * sign
    shift_y = jnp.floor(lvl * (bh / 3.0) / 10.0) * sign
    m_trx = assemble(ones, zeros, -shift_x, zeros, ones, zeros)
    m_try = assemble(ones, zeros, zeros, zeros, ones, -shift_y)
    return jnp.where(use_x, m_trx, m_try)


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
    """Bilinear gather with per-pixel inverse affine params (utility; the
    production paths use the separable/Pallas warps — kept for exact direct
    bilinear resampling needs and tests).

    img (H, W, C); inv_map (H, W, 6) rows [ia, ib, itx, ic, id, ity].
    Out-of-range samples read 0 (cv2 BORDER_CONSTANT).

    TPU gathers are per-row scalar-granularity, so the 4 bilinear taps are
    folded into 2 gathers over a channel-paired table: P[y, x] holds
    (img[y, x], img[y, x+1]) — one gather per y-tap fetches both x-taps.
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[-1]
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

    shifted = jnp.concatenate([img[:, 1:], jnp.zeros((h, 1, c), img.dtype)],
                              axis=1)
    pair = jnp.concatenate([img, shifted], axis=-1)             # (H, W, 2C)

    inx = (x0i >= 0) & (x0i < w)
    inx1 = (x0i + 1 >= 0) & (x0i + 1 < w)

    def tap(yi):
        iny = (yi >= 0) & (yi < h)
        v = pair[jnp.clip(yi, 0, h - 1), jnp.clip(x0i, 0, w - 1)]
        va = jnp.where((iny & inx)[..., None], v[..., :c], 0.0)
        vb = jnp.where((iny & inx1)[..., None], v[..., c:], 0.0)
        return va, vb

    v00, v01 = tap(y0i)
    v10, v11 = tap(y0i + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


# ----------------------------------------------------------- chain step ----

def _lerp_axis(pair, idx, frac, axis: int, limit: int):
    """2-tap linear interp along one axis from a channel-paired table.

    ``pair`` holds (x, shift(x)) in split channels so ONE axis-aligned
    take_along_axis fetches both taps — single-axis gathers run at HBM
    bandwidth on TPU, unlike 2D-indirect gathers (which additionally
    poison lax.switch compilation)."""
    c = pair.shape[-1] // 2
    v = jnp.take_along_axis(pair, jnp.clip(idx, 0, limit - 1)[..., None],
                            axis=axis)
    ok = ((idx >= -1) & (idx <= limit - 1))[..., None]
    a = jnp.where(ok & (idx >= 0)[..., None], v[..., :c], 0.0)
    b = jnp.where(ok & (idx + 1 <= limit - 1)[..., None], v[..., c:], 0.0)
    f = frac[..., None]
    return a * (1 - f) + b * f


def _warp_affine_2pass(img, inv):
    """Affine warp via the two-pass separable decomposition
    (Catmull-Smith): a horizontal resample with row-dependent coefficients
    followed by a vertical resample — only axis-aligned gathers, no 2D
    indirection. ``inv`` is the 2x3 output->source map
    [sx; sy] = [[a,b,c],[d,e,f]] @ [xo, yo, 1].

    Within-quantization-tolerance divergence from direct bilinear (the
    classic 2-pass approximation); border semantics are cv2 BORDER_CONSTANT
    zeros. Requires |e| not tiny (true for the OA-Mix op families:
    rotations <= 30 deg, shears <= 0.3, translations).
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[-1]
    a, b, cc = inv[0, 0], inv[0, 1], inv[0, 2]
    d, e, f = inv[1, 0], inv[1, 1], inv[1, 2]
    e_safe = jnp.where(jnp.abs(e) < 1e-3, 1e-3, e)

    xo = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = jnp.arange(h, dtype=jnp.float32)[:, None]
    yo = jnp.arange(h, dtype=jnp.float32)[:, None]

    # pass 1 (horizontal): tmp[u, xo] = img[u, gx(u, xo)]
    gx = (a - b * d / e_safe) * xo + (b / e_safe) * u + (cc - b * f / e_safe)
    gx = jnp.broadcast_to(gx, (h, w))
    x0 = jnp.floor(gx)
    shifted = jnp.concatenate([img[:, 1:], jnp.zeros((h, 1, c), img.dtype)],
                              axis=1)
    pair_x = jnp.concatenate([img, shifted], axis=-1)
    tmp = _lerp_axis(pair_x, x0.astype(jnp.int32), gx - x0, axis=1, limit=w)

    # pass 2 (vertical): out[yo, xo] = tmp[sy(yo, xo), xo]
    sy = d * xo + e * yo + f
    sy = jnp.broadcast_to(sy, (h, w))
    y0 = jnp.floor(sy)
    shifted_y = jnp.concatenate([tmp[1:], jnp.zeros((1, w, c), tmp.dtype)],
                                axis=0)
    pair_y = jnp.concatenate([tmp, shifted_y], axis=-1)
    return _lerp_axis(pair_y, y0.astype(jnp.int32), sy - y0, axis=0, limit=h)


class _FgInfo(NamedTuple):
    boxes: jnp.ndarray       # (MAX_FG, 4)
    valid: jnp.ndarray       # (MAX_FG,)
    scores: jnp.ndarray      # (MAX_FG,)
    best_id: jnp.ndarray     # (H, W) int8: strongest-mask box per pixel,
    # or the identity sentinel G where every mask < pallas_fg.BID_EPS
    # (the blend weight there is negligible; the sentinel collapses the
    # far-field Voronoi spray that multiplied the piecewise-warp
    # kernels' per-block work — pass measured 0.93 -> 0.32 ms)
    cover: jnp.ndarray       # (H, W) bf16 combined coverage 1-prod(1-m_i)
    union: jnp.ndarray       # (H, W) bf16 max_i m_i (bg_only's fg-union)
    # narrow dtypes: these maps are closed over by every lax.switch branch,
    # so they cross (are materialized at) every conditional boundary — the
    # dominant per-execution cost. int8 indexes MAX_FG=16; bf16 blend
    # weights cost <=0.4% of one intensity level.
    pw_x: Optional[tuple] = None   # pw_prep(best_id) for row-shift passes
    pw_y: Optional[tuple] = None   # pw_prep(best_id.T) for the y pass


def _precompute_fg_maps(boxes, valid, h: int, w: int, sigma_ratio: float):
    """Per-image mask maps shared by every aug call (the boxes never change
    within a view, so this runs once, not 27x).

    The blurred box masks are separable: per box only the 1-D x/y profiles
    are computed (G x W + G x H erf evaluations — trivial), and the three
    full-res maps come from ONE fused broadcast-reduce over the box axis.
    (A fori_loop carrying four (H, W) buffers measured 130 ms/image — each
    iteration re-materialized every carry; this form is ~20x faster.)
    """
    g = boxes.shape[0]
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5

    def profiles(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        sx = jnp.maximum((x2 - x1) * sigma_ratio * 2.0 / 3.0, 1e-3)
        sy = jnp.maximum((y2 - y1) * sigma_ratio * 2.0 / 3.0, 1e-3)
        fx = (_box_blur_1d(xs, x1, x2, sx)
              + _box_blur_1d(-xs, x1, x2, sx)
              + _box_blur_1d(2.0 * w - xs, x1, x2, sx))
        fy = (_box_blur_1d(ys, y1, y2, sy)
              + _box_blur_1d(-ys, y1, y2, sy)
              + _box_blur_1d(2.0 * h - ys, y1, y2, sy))
        return fx, fy

    fx, fy = jax.vmap(profiles)(boxes)                    # (G, W), (G, H)
    small = ((boxes[:, 2] - boxes[:, 0]) < 1) | \
            ((boxes[:, 3] - boxes[:, 1]) < 1)
    gate = (valid & ~small).astype(jnp.float32)           # (G,)
    fyg = jnp.clip(fy, 0.0, 1.0) * gate[:, None]
    fxg = jnp.clip(fx, 0.0, 1.0)
    from .pallas_fg import fg_maps
    return fg_maps(fxg, fyg, h, w)


def _pw_params(key, boxes, severity: float, inj=None):
    """Per-call draws shared by the pw family kernels — same RNG layout as
    ``_op_matrices`` (lvl/sign per box, ONE axis coin per call, matching
    reference bbox_augmentation.py:103-117 shear_xy/translate_xy).
    ``inj`` = (levels (G,), signs (G,), coin) shared-draw-table mode."""
    g = boxes.shape[0]
    if inj is not None:
        lvl = inj[0][:g]
        sign = inj[1][:g]
        use_x = inj[2] < 0.5
    else:
        u = jax.random.uniform(key, (g, 3))
        lvl = 0.1 + u[:, 0] * (severity - 0.1)
        sign = jnp.where(u[:, 1] > 0.5, -1.0, 1.0)
        use_x = u[0, 2] < 0.5
    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    return lvl, sign, use_x, cx, cy, bw, bh


def _pw_finish(img, warped, fg: _FgInfo):
    cov = fg.cover.astype(jnp.float32)[..., None]
    out = img * (1.0 - cov) + warped * cov
    return jnp.clip(jnp.round(out), 0, 255)


def _pw_pass_x(img, fg: _FgInfo, p):
    from .pallas_warp import piecewise_shift_rows
    bid = fg.best_id.astype(jnp.int32)
    return piecewise_shift_rows(img, bid, p, 512, prep=fg.pw_x)


def _pw_pass_y(img, fg: _FgInfo, p):
    from .pallas_warp import piecewise_shift_rows
    bid = fg.best_id.astype(jnp.int32)
    return jnp.transpose(
        piecewise_shift_rows(jnp.transpose(img, (1, 0, 2)),
                             jnp.transpose(bid), p, 768, prep=fg.pw_y),
        (1, 0, 2))


def _warp_lanes(img):
    """uint8 chain lanes upcast to bf16 for the shift kernels (identical
    values — ints <= 255 are exact in bf16 — so the kernel math and the
    blend results are bit-identical to the bf16-lane form)."""
    return img.astype(jnp.bfloat16) if img.dtype == jnp.uint8 else img


def _pw_rotate(img, fg: _FgInfo, key, severity: float, inj=None):
    """bboxes_only_rotate on the piecewise-shift kernel: centered Paeth
    X(a1) Y(b2) X(a1) 3-shear factorization (3 per-row shift passes).
    Same per-pixel strongest-box approximation as the gather path; the
    rotation interpolates through 3 lerp stages instead of 2."""
    img = _warp_lanes(img)
    h, w = img.shape[0], img.shape[1]
    lvl, sign, _, cx, cy, _, _ = _pw_params(key, fg.boxes, severity, inj)
    deg = jnp.floor(lvl * 30.0 / 10.0) * sign
    rad = jnp.deg2rad(deg)
    a1 = -jnp.tan(rad / 2.0)
    b2 = jnp.sin(rad)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None]
    p1 = a1[None, :] * (ys - cy[None, :])
    p2 = b2[None, :] * (xs - cx[None, :])
    out = _pw_pass_x(img, fg, p1)
    out = _pw_pass_y(out, fg, p2)
    out = _pw_pass_x(out, fg, p1)
    return _pw_finish(img, out, fg)


def _pw_shear(img, fg: _FgInfo, key, severity: float, inj=None):
    """bboxes_only_shear_xy: ONE shift pass — x or y picked by the
    per-call coin via lax.cond (under scan the untaken pass never runs;
    the old 3-pass form paid two dead kernel passes + transposes)."""
    img = _warp_lanes(img)
    h, w = img.shape[0], img.shape[1]
    lvl, sign, use_x, cx, cy, _, _ = _pw_params(key, fg.boxes, severity,
                                                inj)
    sh = lvl * 0.3 / 10.0 * sign
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None]
    out = jax.lax.cond(
        use_x,
        lambda im: _pw_pass_x(im, fg, sh[None, :] * (ys - cy[None, :])),
        lambda im: _pw_pass_y(im, fg, sh[None, :] * (xs - cx[None, :])),
        img)
    return _pw_finish(img, out, fg)


def _pw_translate(img, fg: _FgInfo, key, severity: float, inj=None):
    """bboxes_only_translate_xy: ONE constant-shift pass (x or y).

    Bound note: the pass clamps per-box shifts to the kernel's max_shift
    (512 for x, 768 for the transposed y pass). The reference bound is
    box_extent/3, so a gt box wider than 1536 px at max severity would
    translate 512 px instead of up to ~682 — a documented saturation on
    near-image-width boxes (their blend mask covers most of the frame
    anyway); all rotate/shear bounds fit well inside the kernel pad."""
    img = _warp_lanes(img)
    h, w = img.shape[0], img.shape[1]
    lvl, sign, use_x, _, _, bw, bh = _pw_params(key, fg.boxes, severity,
                                                inj)
    tx = jnp.floor(lvl * (bw / 3.0) / 10.0) * sign
    ty = jnp.floor(lvl * (bh / 3.0) / 10.0) * sign
    ones_h = jnp.ones((h, 1), jnp.float32)
    ones_w = jnp.ones((w, 1), jnp.float32)
    out = jax.lax.cond(
        use_x,
        lambda im: _pw_pass_x(im, fg, ones_h * tx[None, :]),
        lambda im: _pw_pass_y(im, fg, ones_w * ty[None, :]),
        img)
    return _pw_finish(img, out, fg)


def _apply_geo_bboxes_only(img, fg: _FgInfo, inv_boxes):
    """bboxes_only_*: ONE per-pixel-separable 2-pass warp. The per-box
    inverse matrices are gathered per pixel by the precomputed
    strongest-box assignment and fed into the two axis-aligned resampling
    passes — no 2D-indirect gather (which also poisons lax.switch
    compile times), no per-box loop (measured 13x slower).

    Divergence note: pass 1 rows are resampled with the matrix of the row
    being read rather than the consuming output pixel; the two differ only
    across box-mask boundaries where the blend weight is already small.
    """
    img = img.astype(jnp.float32)        # gather path stays f32 (CPU/opt-out)
    h, w = img.shape[0], img.shape[1]
    c = img.shape[-1]
    # row G = identity matrix for the far-from-every-box sentinel id
    # (pallas_fg.BID_EPS)
    ident = jnp.asarray([[1.0, 0.0, 0.0, 0.0, 1.0, 0.0]], jnp.float32)
    inv_pad = jnp.concatenate([inv_boxes, ident], axis=0)     # (G+1, 6)
    m = inv_pad[fg.best_id.astype(jnp.int32)]                 # (H, W, 6)
    xo = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = jnp.arange(h, dtype=jnp.float32)[:, None]
    e = jnp.where(jnp.abs(m[..., 4]) < 1e-3, 1e-3, m[..., 4])
    gx = ((m[..., 0] - m[..., 1] * m[..., 3] / e) * xo
          + (m[..., 1] / e) * u
          + (m[..., 2] - m[..., 1] * m[..., 5] / e))
    x0 = jnp.floor(gx)
    shifted = jnp.concatenate([img[:, 1:], jnp.zeros((h, 1, c), img.dtype)],
                              axis=1)
    pair_x = jnp.concatenate([img, shifted], axis=-1)
    tmp = _lerp_axis(pair_x, x0.astype(jnp.int32), gx - x0, axis=1, limit=w)

    sy = m[..., 3] * xo + m[..., 4] * u + m[..., 5]
    y0 = jnp.floor(sy)
    shifted_y = jnp.concatenate([tmp[1:], jnp.zeros((1, w, c), tmp.dtype)],
                                axis=0)
    pair_y = jnp.concatenate([tmp, shifted_y], axis=-1)
    warped = _lerp_axis(pair_y, y0.astype(jnp.int32), sy - y0, axis=0,
                        limit=h)
    cov = fg.cover.astype(jnp.float32)[..., None]
    out = img * (1.0 - cov) + warped * cov
    return jnp.clip(jnp.round(out), 0, 255)




def _merged_ctx(fg: _FgInfo, ml_masks, h: int, w: int):
    """Per-view precompute for the merged depth step: the slot-id map
    (the ml hard boxes partition the image: slot 0, slot 1, complement)
    and the per-box id map + kernel presence tables shared by every
    per-slot warp trio of the view."""
    n_slots = ml_masks.shape[0] + 1
    g = fg.boxes.shape[0]
    slot_id = jnp.full((h, w), n_slots - 1, jnp.int32)
    for s in range(n_slots - 2, -1, -1):
        slot_id = jnp.where(ml_masks[s] > 0, s, slot_id)
    bid = fg.best_id.astype(jnp.int32)
    ctx = dict(slot_id=slot_id, bid=bid, bidT=jnp.transpose(bid),
               n_slots=n_slots, g=g, prep_x=None, prep_y=None)
    if jax.devices()[0].platform != "cpu":
        from .pallas_warp import merged_prep
        ctx["prep_x"] = merged_prep(bid, 1, g, 4)
        ctx["prep_y"] = merged_prep(ctx["bidT"], 1, g, 4)
    return ctx


def _depth_step_merged(img16, ck, od, fg: _FgInfo, mctx, severity: float,
                       version: str, slot_active, inj=None):
    """One merged depth step: every slot's sampled op in unconditional
    fused passes instead of S+1 serial lax.cond + lax.switch executions
    (measured ~1.25 ms of fixed conditional overhead per execution).

    Exact-equivalence to the per-slot dispatch (_aug_once):
    - the ml slots partition the image (overlap-rejected hard boxes), so
      per pixel exactly one slot's op result is selected — the legacy
      masked accumulation IS a select;
    - all slots of a depth step read the SAME input image, so the
      photometric LUT family shares one set of image statistics
      (autocontrast extrema, equalize histogram — parameter-free ops are
      identical across slots; posterize/solarize differ only by per-slot
      scalars, broadcast per pixel through the slot-id map);
    - every geometric family is a X(p1)*Y(p2)*X(p3) triple of per-row
      piecewise shifts (rotate = Paeth 3-shear; shear/translate = one
      axis pass + two zero passes — a zero shift is a bit-exact identity
      in the lerp kernel), so each slot's drawn geo op runs as ONE
      unconditional per-slot triple (ops/pallas_warp.py
      merged_shift_rows) whose is_bb/is_bg flags runtime-gate the kernel
      work: a bg draw applies one global shift, a bb draw applies the
      per-box shifts of the locally present boxes, a photometric draw
      degenerates to a copy. The slot's params apply GLOBALLY before the
      final per-pixel select — identical content semantics to the legacy
      dispatch (a one-trio composite over (slot, box) ids was measured
      to couple cross-slot content through the chained passes: 1.3% of
      pixels off by >2/255 — rejected). Per-family legacy clip bounds
      are applied to the shift tables, preserving the saturation
      behavior of the per-family kernels. The fg-union alpha rides as a
      4th channel so bg blends use their warped-union map.

    Production RNG: one uniform (G, 3) table per slot replaces the
    per-branch draws (identical distributions; the stream assignment to
    branch parameters differs from the legacy dispatch — shared-draw-table
    injection is unchanged and bit-compatible).
    Ref workload: oa_mix.py:207-236, bbox_augmentation.py:31-118,
    augmix.py:83-188.
    """
    from .pallas_warp import merged_shift_rows
    from .photometric import (apply_lut_nibble, equalize_lut_from_hist,
                              grayscale_l, image_hist256)
    if img16.dtype == jnp.uint8:       # u8 lanes: kernels take bf16
        img16 = img16.astype(jnp.bfloat16)
    h, w = img16.shape[0], img16.shape[1]
    img = img16.astype(jnp.float32)
    g = fg.boxes.shape[0]
    n_slots = mctx["n_slots"]
    n_photo = 4 if version == "augmix" else 9
    slot_id = mctx["slot_id"]

    # ---- per-slot draws (same key layout as the slot scan)
    if inj is not None:
        lv, sg_t, cn = inj                 # (S, MAX_FG), (S, MAX_FG), (S,)
        lvl = lv[:, :g]
        sign = sg_t[:, :g]
        coin = cn
    else:
        u = jax.vmap(lambda k: jax.random.uniform(k, (g, 3)))(ck)
        lvl = 0.1 + u[..., 0] * (severity - 0.1)
        sign = jnp.where(u[..., 1] > 0.5, -1.0, 1.0)
        coin = u[:, 0, 2]
    lvl0, sign0 = lvl[:, 0], sign[:, 0]                  # (S,) scalar draws

    def px(vals, dtype=jnp.float32):
        """Broadcast a per-slot scalar tuple to (H, W) via the slot map."""
        o = jnp.broadcast_to(jnp.asarray(vals[n_slots - 1], dtype), (h, w))
        for s in range(n_slots - 2, -1, -1):
            o = jnp.where(slot_id == s, jnp.asarray(vals[s], dtype), o)
        return o

    op_px = px(od, jnp.int32)

    # ---- photometric family (fused elementwise; eq/sharpness gated)
    xi = jnp.trunc(jnp.clip(img, 0, 255))
    xc = jnp.clip(img, 0, 255)
    lo_hi = xi.reshape(h, w * xi.shape[-1])
    lo = jnp.min(lo_hi, axis=0).reshape(w, -1).min(axis=0)       # (C,)
    hi = jnp.max(lo_hi, axis=0).reshape(w, -1).max(axis=0)
    span = hi - lo
    scale = 255.0 / jnp.where(span > 0, span, 1.0)
    ac = jnp.where(span > 0,
                   jnp.clip(jnp.trunc(xi * scale - lo * scale), 0, 255), xi)
    any_eq = jnp.any((od == 1) & slot_active)
    eq = jax.lax.cond(
        any_eq,
        lambda x: apply_lut_nibble(x, equalize_lut_from_hist(
            image_hist256(x))),
        lambda x: x, xi)
    bits = jnp.maximum(4 - jnp.floor(lvl0 * 4.0 / 10.0).astype(jnp.int32), 1)
    pmask = (255 << (8 - bits)) & 255                            # (S,)
    post = jnp.bitwise_and(xi.astype(jnp.int32),
                           px(pmask, jnp.int32)[..., None]) \
        .astype(jnp.float32)
    thr = (256 - jnp.floor(lvl0 * 256.0 / 10.0).astype(jnp.int32)) \
        .astype(jnp.float32)
    sol = jnp.where(xc < px(thr)[..., None], xc, 255.0 - xc)
    opc = op_px[..., None]
    photo = jnp.where(opc == 0, ac,
                      jnp.where(opc == 1, eq,
                                jnp.where(opc == 2, post, sol)))
    if version != "augmix":
        fct = px(lvl0 * 1.8 / 10.0 + 0.1)[..., None]             # enhance f
        gray = grayscale_l(xc)[..., None]
        inv = 255.0 - xc

        def blend(degen):
            return jnp.clip(jnp.trunc(degen + fct * (xc - degen)), 0, 255)

        color = blend(jnp.broadcast_to(gray, xc.shape))
        mean = jnp.floor(jnp.mean(gray) + 0.5)
        contrast = blend(jnp.full_like(xc, mean))
        bright = blend(jnp.zeros_like(xc))
        any_sharp = jnp.any((od == 8) & slot_active)
        from .photometric import enhance_sharpness

        def sharp_fn(x):
            # per-pixel factor: inline the blend with fct (the shared
            # smooth degenerate is slot-independent)
            import numpy as _np
            k = jnp.asarray(_np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                                      _np.float32) / 13.0).reshape(1, 1, 3, 3)
            xt = x.transpose(2, 0, 1)[:, None]
            sm = jax.lax.conv_general_dilated(
                xt, k, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            sm = jnp.clip(jnp.floor(sm[:, 0].transpose(1, 2, 0) + 0.5),
                          0, 255)
            ri = jnp.arange(h)[:, None, None]
            ci = jnp.arange(w)[None, :, None]
            border = (ri == 0) | (ri == h - 1) | (ci == 0) | (ci == w - 1)
            return jnp.where(border, x, sm)

        sharp_degen = jax.lax.cond(any_sharp, sharp_fn, lambda x: x, xc)
        sharp = blend(sharp_degen)
        photo = jnp.where(opc == 4, inv,
                          jnp.where(opc == 5, color,
                                    jnp.where(opc == 6, contrast,
                                              jnp.where(opc == 7, bright,
                                                        jnp.where(opc == 8,
                                                                  sharp,
                                                                  photo)))))

    # ---- geometric family: one X*Y*X trio PER SLOT, cond-gated on the
    # slot actually drawing a geo op. The gate is EXACT: a photo-drawn
    # slot's geo_out is never selected (its region has opc < n_photo),
    # so skipping the trio changes nothing — but saves the 3 Pallas
    # passes + boundary materializations (the merged path's measured
    # regression vs the slot dispatch was precisely these unconditional
    # trios: 132 ms vs ~90 ms chain). E[geo slots/step] = S * 6/n_ops.
    fam = od - n_photo                                           # (S,)
    boxes = fg.boxes
    cxg = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cyg = (boxes[:, 1] + boxes[:, 3]) / 2.0
    bwg = boxes[:, 2] - boxes[:, 0] + 1
    bhg = boxes[:, 3] - boxes[:, 1] + 1
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]               # (H, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[:, None]               # (W, 1)
    # legacy per-family clip bounds (see _pw_pass_x/_pw_pass_y and the
    # br_bg_* branches) — preserved exactly, including the documented
    # bboxes-translate saturation on near-image-width boxes
    msx_bb, msy_bb = 512, 768
    msx_bgr, msy_bgr = int(0.27 * h / 2) + 4, int(0.50 * w / 2) + 4
    msx_bgs, msy_bgs = int(0.3 * h) + 4, int(0.3 * w) + 4
    msx_bgt, msy_bgt = w // 3 + 4, h // 3 + 4

    un = fg.union.astype(jnp.float32)
    # alpha rides as un*255 and is divided back after the warp — BIT-SAME
    # as the legacy _bg_blend (which warps un*255), not just equivalent.
    # x4 rides in the chain lane dtype (bf16 default, see _aug_once).
    x4 = jnp.concatenate(
        [img16, (un[..., None] * 255.0).astype(img16.dtype)], axis=-1)
    cov = fg.cover.astype(jnp.float32)[..., None]
    # bf16 carry: photo and geo_out are integer-valued (every family
    # trunc/rounds), so the cast is exact and halves the cond boundary
    out = photo.astype(jnp.bfloat16)
    for s in range(n_slots):
        l_g, s_g = lvl[s], sign[s]
        rad = jnp.deg2rad(jnp.floor(l_g * 30.0 / 10.0) * s_g)
        a1, b2 = -jnp.tan(rad / 2.0), jnp.sin(rad)
        sh = l_g * 0.3 / 10.0 * s_g
        txb = jnp.floor(l_g * (bwg / 3.0) / 10.0) * s_g
        tyb = jnp.floor(l_g * (bhg / 3.0) / 10.0) * s_g
        radB = jnp.deg2rad(jnp.floor(lvl0[s] * 30.0 / 10.0) * sign0[s])
        a1B, b2B = -jnp.tan(radB / 2.0), jnp.sin(radB)
        shB = lvl0[s] * 0.3 / 10.0 * sign0[s]
        txB = jnp.floor(lvl0[s] * (w / 3.0) / 10.0) * sign0[s]
        tyB = jnp.floor(lvl0[s] * (h / 3.0) / 10.0) * sign0[s]
        ux = coin[s] < 0.5
        f = fam[s]
        is_bb_s = ((f >= 0) & (f < 3) & slot_active[s])[None]
        is_bg_s = ((f >= 3) & (f < 6) & slot_active[s])[None]

        def geo_fn(acc, s=s, f=f, l_g=l_g, s_g=s_g, a1=a1, b2=b2, sh=sh,
                   txb=txb, tyb=tyb, a1B=a1B, b2B=b2B, shB=shB, txB=txB,
                   tyB=tyB, ux=ux, is_bb_s=is_bb_s, is_bg_s=is_bg_s):
            zH, zW = jnp.zeros((h, g)), jnp.zeros((w, g))
            zh1, zw1 = jnp.zeros((h, 1)), jnp.zeros((w, 1))

            def sel(fi, cand, acc2, f=f):
                return jnp.where(f == fi, cand, acc2)

            # bboxes_only shift tables (H/W, G)
            rot1 = jnp.clip(a1[None, :] * (ys - cyg[None, :]),
                            -msx_bb, msx_bb)
            rot2 = jnp.clip(b2[None, :] * (xs - cxg[None, :]),
                            -msy_bb, msy_bb)
            p1 = sel(0, rot1, zH)
            p1 = sel(1, jnp.where(ux, jnp.clip(
                sh[None, :] * (ys - cyg[None, :]), -msx_bb, msx_bb), zH), p1)
            p1 = sel(2, jnp.where(ux, jnp.clip(jnp.broadcast_to(
                txb[None, :], (h, g)), -msx_bb, msx_bb), zH), p1)
            p2 = sel(0, rot2, zW)
            p2 = sel(1, jnp.where(ux, zW, jnp.clip(
                sh[None, :] * (xs - cxg[None, :]), -msy_bb, msy_bb)), p2)
            p2 = sel(2, jnp.where(ux, zW, jnp.clip(jnp.broadcast_to(
                tyb[None, :], (w, g)), -msy_bb, msy_bb)), p2)
            p3 = sel(0, rot1, zH)
            # bg_only shift columns (H/W, 1)
            brot1 = jnp.clip(a1B * (ys - h / 2.0), -msx_bgr, msx_bgr)
            brot2 = jnp.clip(b2B * (xs - w / 2.0), -msy_bgr, msy_bgr)
            q1 = sel(3, brot1, zh1)
            q1 = sel(4, jnp.where(ux, jnp.clip(shB * ys, -msx_bgs, msx_bgs),
                                  zh1), q1)
            q1 = sel(5, jnp.where(ux, jnp.clip(jnp.broadcast_to(
                txB, (h, 1)), -msx_bgt, msx_bgt), zh1), q1)
            q2 = sel(3, brot2, zw1)
            q2 = sel(4, jnp.where(ux, zw1, jnp.clip(shB * xs,
                                                    -msy_bgs, msy_bgs)), q2)
            q2 = sel(5, jnp.where(ux, zw1, jnp.clip(jnp.broadcast_to(
                tyB, (w, 1)), -msy_bgt, msy_bgt)), q2)
            q3 = sel(3, brot1, zh1)

            # blend source upcast INSIDE the cond: the boundary operand
            # stays the bf16 img16 (12 MB) instead of the f32 image
            imf = img16.astype(jnp.float32)
            o1 = merged_shift_rows(x4, mctx["bid"], p1, q1, is_bb_s,
                                   is_bg_s, prep=mctx["prep_x"])
            o2t = merged_shift_rows(jnp.transpose(o1, (1, 0, 2)),
                                    mctx["bidT"], p2, q2, is_bb_s, is_bg_s,
                                    prep=mctx["prep_y"])
            o2 = jnp.transpose(o2t, (1, 0, 2))
            wp = merged_shift_rows(o2, mctx["bid"], p3, q3, is_bb_s,
                                   is_bg_s, prep=mctx["prep_x"])
            warped, w_un = wp[..., :3], wp[..., 3] / 255.0
            # blends (identical to _pw_finish / _bg_blend, incl. dtypes:
            # warped/w_un stay in the lane dtype until the f32 promote)
            bb_out = jnp.clip(jnp.round(imf * (1.0 - cov) + warped * cov),
                              0, 255)
            mnt = jnp.maximum(un, w_un)[..., None]
            bg_out = jnp.clip(jnp.round(mnt * imf + (1.0 - mnt) * warped),
                              0, 255)
            geo_out = jnp.where(f >= 3, bg_out, bb_out)
            return jnp.where((slot_id == s)[..., None] & (opc >= n_photo),
                             geo_out.astype(acc.dtype), acc)

        out = jax.lax.cond(is_bb_s[0] | is_bg_s[0], geo_fn,
                           lambda acc: acc, out)
    return jnp.clip(jnp.round(out.astype(jnp.float32)),
                    0, 255).astype(_lane_dtype())


def _aug_once(img_io, key, op_idx, fg: _FgInfo, img_shape, severity: float,
              version: str, active=None, inj=None):
    """One reference ``aug()`` call (oa_mix.py:264): the sampled op applied
    to the full image.

    ``op_idx`` is traced; dispatch is a ``lax.switch`` over the reference's
    op list (get_aug_list, oa_mix.py:15) — outside of vmap only the selected
    branch executes, so the expensive warp branches cost nothing when a LUT
    op is drawn.

    The image crosses the conditional boundary in bf16: TPU conditionals
    materialize their operands/results (~16 ms per execution for the f32
    image — measured dominant); halving the bytes halves that.

    bf16 lanes (round-5): the branch input STAYS bf16 — the chain state
    is uint8-valued and bf16 represents 0..255 exactly, so every branch
    read halves. Elementwise photometric ops upcast to f32 inside their
    fused consumers (free); the Pallas shift kernels load bf16 tiles and
    upcast in VMEM (identical f32 math, half the HBM traffic). The only
    divergence vs the f32 path: warp/blend intermediates round to bf16
    (spacing <= 1.0 below 256) before the final integer round — measured
    <= ±1/255 against the f32 lanes on-chip. OAMIX_F32_LANES=1 restores
    the f32 path (A/B + debugging).
    """
    img = img_io.astype(_lane_dtype())
    all_ops = version != "augmix"
    n_photo = 9 if all_ops else 4

    def imgf():
        """f32 view of the chain state, upcast INSIDE the branch body.

        Photometric ops must compute in f32 (weak-typed scalar consts
        would otherwise keep bf16 math, diverging from the host oracle
        and the merged depth step by a few /255) — but the upcast has to
        live inside each branch: hoisting it would make the f32 image a
        switch operand and resurrect the boundary materialization the
        bf16 lanes removed. The geo branches keep bf16 lanes (their
        Pallas kernels upcast in VMEM; blends promote via f32 masks)."""
        return img.astype(jnp.float32)

    def lvl_from(k):
        if inj is not None:      # shared-draw-table mode (parity tests)
            return inj[0][0]
        return 0.1 + jax.random.uniform(k) * (severity - 0.1)

    def br_auto(k):
        return autocontrast(imgf())

    def br_eq(k):
        return equalize(imgf())

    def br_post(k):
        bits = 4 - jnp.floor(lvl_from(k) * 4.0 / 10.0).astype(jnp.int32)
        return posterize(imgf(), jnp.maximum(bits, 1))

    def br_sol(k):
        thr = 256 - jnp.floor(lvl_from(k) * 256.0 / 10.0).astype(jnp.int32)
        return solarize(imgf(), thr)

    def br_inv(k):
        return invert(imgf())

    def _f(k):
        return lvl_from(k) * 1.8 / 10.0 + 0.1

    # bbox geo: ONE BRANCH PER FAMILY so shear/translate pay a single
    # shift pass (their old shared branch ran the rotate-shaped 3-pass
    # pipeline with two dead passes). Pallas path default on TPU;
    # OAMIX_GEO_PW=0 restores the per-pixel gather path.
    def _geo_gather(k, family):
        mats = _op_matrices(k, family, fg.boxes, fg.valid, img_shape,
                            severity, is_bg=False, inj=inj)
        inv = jax.vmap(_invert_2x3)(mats)
        return _apply_geo_bboxes_only(img, fg, inv.reshape(-1, 6))

    def br_geo_rot(k):
        if _use_pw_geo():
            return _pw_rotate(img, fg, k, severity, inj)
        return _geo_gather(k, 0)

    def br_geo_shear(k):
        if _use_pw_geo():
            return _pw_shear(img, fg, k, severity, inj)
        return _geo_gather(k, 1)

    def br_geo_trans(k):
        if _use_pw_geo():
            return _pw_translate(img, fg, k, severity, inj)
        return _geo_gather(k, 2)

    # bg geo: family-specific Pallas shear warps (ops/pallas_warp.py).
    # The rgb image and the fg-union alpha (x255, matching the legacy
    # separate-call scaling bit-for-bit) ride ONE 4-channel kernel call:
    # the global-shift kernel's per-block cost is fixed per pass, so one
    # 4ch pass beats two (3ch + 1ch) passes of the same total bytes.
    h_s, w_s = img.shape[0], img.shape[1]

    def _bg_blend(warp_fn, k):
        imgw = _warp_lanes(img)
        un = fg.union.astype(jnp.float32)
        # alpha rides in the image dtype — a f32 alpha would silently
        # promote the whole 4-channel concat back to f32 (and a uint8
        # alpha would trunc-quantize it, so u8 lanes upcast first)
        x4 = jnp.concatenate(
            [imgw, (un[..., None] * 255.0).astype(imgw.dtype)], axis=-1)
        w4 = warp_fn(x4, k)
        maintained = jnp.maximum(un, w4[..., 3] / 255.0)[..., None]
        out = maintained * imgw + (1.0 - maintained) * w4[..., :3]
        return jnp.clip(jnp.round(out), 0, 255)

    def _lvl_sign(k):
        if inj is not None:
            return inj[0][0], inj[1][0], inj[2]
        u = jax.random.uniform(k, (3,))
        lvl = 0.1 + u[0] * (severity - 0.1)
        sign = jnp.where(u[1] > 0.5, -1.0, 1.0)
        return lvl, sign, u[2]

    def br_bg_rotate(k):
        def w(im4, kk):
            lvl, sign, _ = _lvl_sign(kk)
            deg = jnp.floor(lvl * 30.0 / 10.0) * sign
            msx = int(0.27 * h_s / 2) + 4
            msy = int(0.50 * w_s / 2) + 4
            return warp_rotate(im4, jnp.deg2rad(deg), w_s / 2.0, h_s / 2.0,
                               msx, msy)
        return _bg_blend(w, k)

    def br_bg_shear(k):
        def w(im4, kk):
            lvl, sign, coin = _lvl_sign(kk)
            s = lvl * 0.3 / 10.0 * sign
            # bg shear has no center offset (augmix.py: center=None -> t=0)
            # lax.cond: only the drawn axis's warp runs (the old
            # compute-both + where paid two kernel passes every call)
            return jax.lax.cond(
                coin < 0.5,
                lambda im: warp_shear_x(im, s, 0.0, 0.0,
                                        int(0.3 * h_s) + 4),
                lambda im: warp_shear_y(im, s, 0.0, 0.0,
                                        int(0.3 * w_s) + 4),
                im4)
        return _bg_blend(w, k)

    def br_bg_translate(k):
        def w(im4, kk):
            lvl, sign, coin = _lvl_sign(kk)
            tx = jnp.floor(lvl * (w_s / 3.0) / 10.0) * sign
            ty = jnp.floor(lvl * (h_s / 3.0) / 10.0) * sign
            return jax.lax.cond(
                coin < 0.5,
                lambda im: warp_translate_x(im, tx, w_s // 3 + 4),
                lambda im: warp_translate_y(im, ty, h_s // 3 + 4),
                im4)
        return _bg_blend(w, k)

    branches = [br_auto, br_eq, br_post, br_sol]
    if all_ops:
        branches += [br_inv,
                     lambda k: enhance_color(imgf(), _f(k)),
                     lambda k: enhance_contrast(imgf(), _f(k)),
                     lambda k: enhance_brightness(imgf(), _f(k)),
                     lambda k: enhance_sharpness(imgf(), _f(k))]
    branches += [br_geo_rot, br_geo_shear, br_geo_trans,
                 br_bg_rotate, br_bg_shear, br_bg_translate]
    # op order (get_aug_list): photo..., bboxes_only rotate/shear_xy/
    # translate_xy, bg rotate/shear_xy/translate_xy — 1:1 with branches.
    branch_idx = op_idx
    lane_dt = _lane_dtype()

    def to_lane(x):
        # every branch is clipped to [0, 255] already; the extra clip is
        # a fused no-op that guards the u8 cast against any future
        # unclipped branch (f32->u8 casts WRAP out-of-range values)
        return (jnp.clip(x, 0, 255).astype(lane_dt)
                if lane_dt == jnp.uint8 else x.astype(lane_dt))

    branches16 = [lambda k, b=b: to_lane(b(k)) for b in branches]
    if active is not None:
        # empty random-box slots multiply the result by an all-zero mask —
        # route them to a passthrough branch so the expensive op never
        # executes (bit-exact: the output is discarded anyway)
        branches16 = branches16 + [lambda k: img_io.astype(lane_dt)]
        branch_idx = jnp.where(active, branch_idx, len(branches16) - 1)
    return jax.lax.switch(jnp.clip(branch_idx, 0, len(branches16) - 1),
                          branches16, key)


# -------------------------------------------------------------- oamix ------

def _oamix_single(img, gt_boxes, gt_valid, img_shape, key, cfg: Dict,
                  draws: Dict = None):
    """One aug view for one image. img (H, W, 3) float32 [0,255] (pipeline
    color order, BGR like the reference). Returns (aug_img, ml_boxes,
    ml_valid, oa_boxes, oa_valid).

    ``draws`` (shared-draw-table parity mode — tests drive this kernel
    and the host oracle oa_mix_host.oamix_host from ONE pinned table):
    dict of arrays replacing every PRNG draw — ml_boxes (MAX_ML, 4) +
    ml_valid, ws (width,), depth (width,) int, op_idx (width, 3, S+1)
    int, op_level/op_sign (width, 3, S+1, max_fg) f32, op_coin
    (width, 3, S+1) f32, fg_scores (max_fg,), oa_boxes (MAX_OA, 4) +
    oa_valid, mix_us (max_fg + MAX_OA,), m_global (). None = production
    PRNG path, bit-identical to before."""
    h, w = img.shape[0], img.shape[1]
    severity = float(cfg.get("severity", 10))
    width = int(cfg.get("mixture_width", 3))
    depth_cfg = int(cfg.get("mixture_depth", -1))
    sigma_ratio = float(cfg.get("sigma_ratio", 0.3))
    spatial_ratio = int(cfg.get("spatial_ratio", 4))
    version = cfg.get("version", "augmix")

    keys = jax.random.split(key, 8)

    # multilevel random boxes + masks
    if draws is not None:
        ml_boxes = draws["ml_boxes"].astype(jnp.float32)
        ml_valid = draws["ml_valid"].astype(bool)
    else:
        ml_boxes, ml_valid = _sample_random_boxes(
            keys[0], img_shape,
            tuple(cfg.get("random_box_scale", (0.01, 0.1))),
            tuple(cfg.get("random_box_ratio", (3, 1 / 3))), MAX_ML, 1, 3)
    # HARD masks: the reference builds multilevel region masks WITHOUT
    # blur (oa_mix.py:137 get_random_regions default use_blur=False;
    # only fg masks are blurred) — confirmed by the golden parity test.
    ml_masks = jax.vmap(lambda b, v: jnp.where(
        v, _hard_box_mask(jnp.floor(b), h, w), 0.0))(ml_boxes, ml_valid)
    union_mask = jnp.max(ml_masks, axis=0)

    # fg regions: saliency scores + static slots + per-image mask maps
    # (computed ONCE, shared by all ~27 aug calls of this view)
    # Cap on object-aware boxes (reference treats every gt; the cap keeps
    # the per-box fg precompute static). Cityscapes images can exceed 16
    # instances — raise via cfg max_fg (<=127: best_id is int8). The cap's
    # distribution effect is measured in tests/test_oamix_device.py.
    max_fg = int(cfg.get("max_fg", MAX_FG))
    fg_boxes = gt_boxes[:max_fg]
    fg_valid = gt_valid[:max_fg]
    if draws is not None:
        scores = jnp.where(fg_valid,
                           draws["fg_scores"][:max_fg].astype(jnp.float32),
                           -1.0)
    else:
        scores = jax.vmap(lambda b, v: jnp.where(
            v, saliency_score(img, b, min_size=spatial_ratio), -1.0))(
            fg_boxes, fg_valid)
    best_id, cover, union = _precompute_fg_maps(fg_boxes, fg_valid, h, w,
                                                sigma_ratio)
    merged = _use_merged_chain()
    pw_x = pw_y = None
    if _use_pw_geo() and not merged:
        from .pallas_warp import pw_prep
        bid32 = best_id.astype(jnp.int32)
        pw_x = pw_prep(bid32, max_fg, 3)
        pw_y = pw_prep(jnp.transpose(bid32), max_fg, 3)
    fg = _FgInfo(fg_boxes, fg_valid, scores, best_id, cover, union,
                 pw_x=pw_x, pw_y=pw_y)

    # Dirichlet chain weights + all op draws up front
    n_ops = (4 if version == "augmix" else 9) + 6
    max_depth = 3
    n_slots = MAX_ML + 1
    k_ops, k_calls = jax.random.split(keys[2])
    if draws is not None:
        ws = draws["ws"].astype(jnp.float32)
        op_draw = draws["op_idx"].astype(jnp.int32)
    else:
        ws = jax.random.dirichlet(keys[1], jnp.ones((width,)))
        op_draw = jax.random.randint(k_ops, (width, max_depth, n_slots),
                                     0, n_ops)
    import os as _os
    _force = _os.environ.get("OAMIX_FORCE_OP")
    if _force is not None:                       # debug/profiling knob
        op_draw = jnp.full_like(op_draw, int(_force))
    call_keys = jax.random.split(k_calls, width * max_depth * n_slots)
    call_keys = call_keys.reshape(width, max_depth, n_slots, -1)

    # chain-and-mix. Structured as lax.scan over width and over slots so
    # the big _aug_once subgraph (a ~14-branch lax.switch whose bodies
    # include the warp kernels) is TRACED ONCE per depth body instead of
    # width x slots times — the chain dominated the step's compile time.
    # scan (unlike vmap) keeps lax.switch a real conditional: only each
    # step's sampled op executes.
    # The ml region boxes are overlap-rejected (reference get_random_regions
    # discards any box intersecting an earlier one) and the masks are HARD
    # integer-floored boxes, so {ml_1..ml_S, complement} is an exact
    # partition of the image: the reference's weighted blend
    # sum_s mask_s * out_s degenerates to a per-pixel SELECT. Selecting on
    # a bool mask with a bf16 carry is bit-identical to the f32
    # multiply-add it replaces (each pixel receives exactly one slot's
    # bf16 value; adding it to a zero f32 accumulator changed nothing)
    # and halves the accumulator traffic while deleting the bf16->f32
    # materialization at the switch boundary (~20 ms/step measured).
    slot_masks = jnp.concatenate(
        [ml_masks, (1.0 - union_mask)[None]], axis=0) > 0      # (S+1, H, W)
    slot_active = jnp.concatenate([ml_valid, jnp.ones((1,), bool)])
    mctx = _merged_ctx(fg, ml_masks, h, w) if merged else None

    inject = draws is not None

    def chain_body(acc, xs):
        if inject:
            kc, wgt, ck_w, od_w, lv_w, sg_w, cn_w, depth = xs
        else:
            kc, wgt, ck_w, od_w = xs
            depth = (depth_cfg if depth_cfg > 0
                     else jax.random.randint(kc, (), 1, 4))

        def depth_step(d, img_aug16):
            if merged:
                inj_t = ((lv_w[d], sg_w[d], cn_w[d]) if inject else None)
                return _depth_step_merged(img_aug16, ck_w[d], od_w[d], fg,
                                          mctx, severity, version,
                                          slot_active, inj=inj_t)

            def slot_body(img_tmp, sx):
                if inject:
                    ck, od, mask, act, lv, sg, cn = sx
                    inj_t = (lv, sg, cn)
                else:
                    ck, od, mask, act = sx
                    inj_t = None

                def run(it):
                    out_s = _aug_once(img_aug16, ck, od, fg, img_shape,
                                      severity, version, inj=inj_t)
                    return jnp.where(mask[..., None], out_s, it)

                # inactive slots have an all-zero mask: skip BOTH the op and
                # the full-image select (bit-exact — selecting nothing)
                return jax.lax.cond(act, run, lambda it: it, img_tmp), None

            slot_xs = (ck_w[d], od_w[d], slot_masks, slot_active)
            if inject:
                slot_xs = slot_xs + (lv_w[d], sg_w[d], cn_w[d])
            img_tmp, _ = jax.lax.scan(
                slot_body, jnp.zeros(img_aug16.shape, _lane_dtype()),
                slot_xs)
            # round/clip are exact in the lane dtype on the 0..~300 range
            # the branch outputs live in (every integer 0..255 is
            # representable; u8 lanes carry already-rounded ints) —
            # bit-identical to the old f32 path
            if img_tmp.dtype == jnp.uint8:
                return img_tmp
            return jnp.clip(jnp.round(img_tmp), 0, 255)

        # traced upper bound: only `depth` iterations actually execute
        # (E[depth]=2 of max 3 — a masked static loop would waste ~1/3)
        out16 = jax.lax.fori_loop(0, depth, depth_step,
                                  img.astype(_lane_dtype()))
        return acc + wgt * out16.astype(jnp.float32), None

    chain_keys = jax.random.split(keys[5], width)
    chain_xs = (chain_keys, ws, call_keys, op_draw)
    if inject:
        chain_xs = chain_xs + (
            draws["op_level"].astype(jnp.float32),
            draws["op_sign"].astype(jnp.float32),
            draws["op_coin"].astype(jnp.float32),
            draws["depth"].astype(jnp.int32))
    if _os.environ.get("OAMIX_SKIP_CHAIN"):      # profiling knob
        img_oamix = img * 1.0000001
    else:
        img_oamix, _ = jax.lax.scan(
            chain_body, jnp.zeros_like(img), chain_xs)

    # object-aware mixing regions: low-saliency fg + oa random boxes
    low_sal = fg_valid & (scores <= float(cfg.get("score_thresh", 10)))
    if draws is not None:
        oa_boxes = draws["oa_boxes"].astype(jnp.float32)
        oa_valid = draws["oa_valid"].astype(bool)
    else:
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
    if draws is not None:
        mix_us = draws["mix_us"].astype(jnp.float32)
    else:
        mix_us = jax.random.uniform(keys[4], (region_boxes.shape[0],))

    # Per-pixel region masks via separable 1-D profiles (R*W + R*H erf
    # evaluations once, one outer product per loop iteration) instead of a
    # full-resolution erf evaluation per region — and the carries are the
    # two scalar WEIGHT maps, not weighted images: orig/aug factor as
    # img * sum_i (1-m_oa_i) wgt_i and img_oamix * sum_i m_oa_i wgt_i, so
    # the (H, W, 3) FMAs happen once after the loop. Also uses
    # a + b - max(a, b) == min(a, b) for the overlap term.
    def reg_profiles(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        sx = jnp.maximum((x2 - x1) * sigma_ratio * 2.0 / 3.0, 1e-3)
        sy = jnp.maximum((y2 - y1) * sigma_ratio * 2.0 / 3.0, 1e-3)
        xs = jnp.arange(w, dtype=jnp.float32) + 0.5
        ys = jnp.arange(h, dtype=jnp.float32) + 0.5
        fx = (_box_blur_1d(xs, x1, x2, sx) + _box_blur_1d(-xs, x1, x2, sx)
              + _box_blur_1d(2.0 * w - xs, x1, x2, sx))
        fy = (_box_blur_1d(ys, y1, y2, sy) + _box_blur_1d(-ys, y1, y2, sy)
              + _box_blur_1d(2.0 * h - ys, y1, y2, sy))
        return jnp.clip(fx, 0.0, 1.0), jnp.clip(fy, 0.0, 1.0)

    def hard_profiles(box):
        x1, y1, x2, y2 = (jnp.floor(box[0]), jnp.floor(box[1]),
                          jnp.floor(box[2]), jnp.floor(box[3]))
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        return (((xs >= x1) & (xs < x2)).astype(jnp.float32),
                ((ys >= y1) & (ys < y2)).astype(jnp.float32))

    # fg regions keep blurred profiles; oa RANDOM boxes use HARD masks
    # (reference get_random_regions default — golden-test confirmed)
    n_fg_reg = fg_boxes.shape[0]
    fgx, fgy = jax.vmap(reg_profiles)(region_boxes[:n_fg_reg])
    hx, hy = jax.vmap(hard_profiles)(region_boxes[n_fg_reg:])
    rfx = jnp.concatenate([fgx, hx], axis=0)          # (R, W)
    rfy = jnp.concatenate([fgy, hy], axis=0)          # (R, H)
    score_thr = float(cfg.get("score_thresh", 10))

    def mix_body(i, carry):
        a_w, b_w, mask_sum = carry                    # (H, W) each
        m = jnp.where(region_valid[i], rfy[i][:, None] * rfx[i][None, :],
                      0.0)
        overlap = jnp.minimum(mask_sum, m)
        u = mix_us[i]
        m_oa = jnp.where(region_scores[i] <= score_thr, u * 0.5, u)
        wgt = m - overlap * 0.5
        a_w = a_w + (1.0 - m_oa) * wgt
        b_w = b_w + m_oa * wgt
        return a_w, b_w, jnp.maximum(mask_sum, m)

    zhw = jnp.zeros((h, w))
    if _os.environ.get("OAMIX_SKIP_MIX"):        # profiling knob
        a_w, b_w, mask_sum = zhw, zhw, zhw
    else:
        # UNROLLED (R = 21 static): a lax.fori_loop here became 21
        # serial while iterations of tiny elementwise bodies — unrolling
        # lets XLA fuse the whole accumulation chain into a few passes
        # (identical math, same iteration order)
        carry = (zhw, zhw, zhw)
        for _i in range(region_boxes.shape[0]):
            carry = mix_body(_i, carry)
        a_w, b_w, mask_sum = carry

    if draws is not None:
        m_global = draws["m_global"].astype(jnp.float32)
    else:
        m_global = jax.random.beta(keys[5], 1.0, 1.0)
    rest = 1.0 - mask_sum
    ow = a_w + (1.0 - m_global) * rest                # img weight
    aw = b_w + m_global * rest                        # img_oamix weight
    out = img * ow[..., None] + img_oamix * aw[..., None]
    # The reference stores the mixed view as uint8 (oa_mix.py:243
    # np.asarray(img_oamix, np.uint8) truncates after the clip at :307).
    # floor matches that truncation, and the integer-valued result is
    # EXACT in bf16 — halving the batch-scan carry bandwidth (the
    # (B, V-1, H, W, 3) dynamic-update-slice was the single biggest
    # non-conv fusion in the step profile at f32).
    out = jnp.floor(jnp.clip(out, 0, 255)).astype(jnp.bfloat16)
    return out, ml_boxes, ml_valid, oa_boxes, oa_valid


def oamix_batch(img_raw, gt_bboxes, gt_valid, img_shape, key,
                cfg: Dict, draws: Dict = None) -> Dict[str, jnp.ndarray]:
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

    def per_image(img, gt, gtv, shape, k, dr=None):
        views = []
        ml = oam = None
        kks = jax.random.split(k, max(n_aug, 1))
        for v in range(n_aug):
            dv = (None if dr is None else
                  jax.tree_util.tree_map(lambda a: a[v], dr))
            out, mlb, mlv, oab, oav = _oamix_single(img, gt, gtv, shape,
                                                    kks[v], cfg, draws=dv)
            views.append(out)
            ml, oam = (mlb, mlv), (oab, oav)    # keep last view's (ref behavior)
        if not views:
            views = [img.astype(jnp.bfloat16)]
            ml = (jnp.zeros((MAX_ML, 4)), jnp.zeros((MAX_ML,), bool))
            oam = (jnp.zeros((MAX_OA, 4)), jnp.zeros((MAX_OA,), bool))
        return (jnp.stack(views), ml[0], ml[1], oam[0], oam[1])

    # lax.scan over the batch instead of vmap: under vmap every lax.switch
    # branch would execute for every image, while scan keeps the switch a
    # real conditional (only each image's sampled ops run) AND traces the
    # per-image pipeline once regardless of batch size (a trace-time
    # unroll multiplied the step's compile time by b).
    keys = jax.random.split(key, b)

    if draws is not None:
        # shared-draw-table mode: each array in ``draws`` carries leading
        # (B, n_aug, ...) dims, scanned alongside the images
        def scan_im_inj(_, xs):
            img, gt, gtv, shape, k, dr = xs
            return None, per_image(img, gt, gtv, shape, k, dr)

        _, (aug, mlb, mlv, oab, oav) = jax.lax.scan(
            scan_im_inj, None,
            (img_raw, gt_bboxes, gt_valid, img_shape, keys, draws))
    else:
        def scan_im(_, xs):
            img, gt, gtv, shape, k = xs
            return None, per_image(img, gt, gtv, shape, k)

        _, (aug, mlb, mlv, oab, oav) = jax.lax.scan(
            scan_im, None, (img_raw, gt_bboxes, gt_valid, img_shape, keys))
    return dict(aug=aug, multilevel_boxes=mlb, multilevel_valid=mlv,
                oamix_boxes=oab, oamix_valid=oav)
