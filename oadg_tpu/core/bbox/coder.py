"""Box coders (jnp, jit-safe).

DeltaXYWHBBoxCoder matches reference
mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:13 (mmdet 2.x, width = x2-x1):
encode: dx=(gx-px)/pw, dw=log(gw/pw), normalized by target_means/stds;
decode: inverse with dw clipped at |log(wh_ratio_clip)| and optional clip to
image shape.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ...utils.registry import BBOX_CODERS


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:

    def __init__(self,
                 target_means: Sequence[float] = (0., 0., 0., 0.),
                 target_stds: Sequence[float] = (1., 1., 1., 1.),
                 clip_border: bool = True,
                 add_ctr_clamp: bool = False,
                 ctr_clamp: int = 32):
        self.means = np.asarray(target_means, dtype=np.float32)
        self.stds = np.asarray(target_stds, dtype=np.float32)
        self.clip_border = clip_border
        self.add_ctr_clamp = add_ctr_clamp
        self.ctr_clamp = ctr_clamp

    def encode(self, bboxes, gt_bboxes):
        """bboxes, gt_bboxes: (..., 4) -> deltas (..., 4)."""
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        eps = 1e-6
        pw = jnp.maximum(pw, eps)
        ph = jnp.maximum(ph, eps)
        dx = (gx - px) / pw
        dy = (gy - py) / ph
        dw = jnp.log(jnp.maximum(gw, eps) / pw)
        dh = jnp.log(jnp.maximum(gh, eps) / ph)
        deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, deltas, max_shape: Optional[Tuple] = None,
               wh_ratio_clip: float = 16 / 1000):
        """Apply deltas (..., 4) to boxes (..., 4); optionally clip to
        ``max_shape`` = (H, W) scalars or per-box (..., 2) arrays."""
        denorm = deltas * self.stds + self.means
        dx, dy, dw, dh = (denorm[..., 0], denorm[..., 1], denorm[..., 2], denorm[..., 3])
        max_ratio = float(np.abs(np.log(wh_ratio_clip)))
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        dx_width = pw * dx
        dy_height = ph * dy
        if self.add_ctr_clamp:
            dx_width = jnp.clip(dx_width, -self.ctr_clamp, self.ctr_clamp)
            dy_height = jnp.clip(dy_height, -self.ctr_clamp, self.ctr_clamp)
            dw = jnp.minimum(dw, max_ratio)
            dh = jnp.minimum(dh, max_ratio)
        else:
            dw = jnp.clip(dw, -max_ratio, max_ratio)
            dh = jnp.clip(dh, -max_ratio, max_ratio)
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + dx_width
        gy = py + dy_height
        x1 = gx - gw * 0.5
        y1 = gy - gh * 0.5
        x2 = gx + gw * 0.5
        y2 = gy + gh * 0.5
        if self.clip_border and max_shape is not None:
            h, w = max_shape[0], max_shape[1]
            if hasattr(h, "ndim") and getattr(h, "ndim", 0) > 0:
                # per-box shapes: broadcast over trailing box dim
                x1 = jnp.clip(x1, 0, None)
                x2 = jnp.clip(x2, 0, None)
                y1 = jnp.clip(y1, 0, None)
                y2 = jnp.clip(y2, 0, None)
                x1 = jnp.minimum(x1, w)
                x2 = jnp.minimum(x2, w)
                y1 = jnp.minimum(y1, h)
                y2 = jnp.minimum(y2, h)
            else:
                x1 = jnp.clip(x1, 0, w)
                x2 = jnp.clip(x2, 0, w)
                y1 = jnp.clip(y1, 0, h)
                y2 = jnp.clip(y2, 0, h)
        return jnp.stack([x1, y1, x2, y2], axis=-1)


@BBOX_CODERS.register_module()
class YOLOBBoxCoder:
    """YOLO coder (reference mmdet/core/bbox/coder/yolo_bbox_coder.py)."""

    def __init__(self, eps: float = 1e-6):
        self.eps = eps

    def encode(self, bboxes, gt_bboxes, stride):
        x_center_gt = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        y_center_gt = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        w_gt = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        h_gt = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        x_center = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        y_center = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        w_target = jnp.log(jnp.maximum(w_gt / jnp.maximum(w, self.eps), self.eps))
        h_target = jnp.log(jnp.maximum(h_gt / jnp.maximum(h, self.eps), self.eps))
        x_target = jnp.clip((x_center_gt - x_center) / stride + 0.5, self.eps, 1 - self.eps)
        y_target = jnp.clip((y_center_gt - y_center) / stride + 0.5, self.eps, 1 - self.eps)
        return jnp.stack([x_target, y_target, w_target, h_target], axis=-1)

    def decode(self, bboxes, pred_bboxes, stride):
        xy_centers = (bboxes[..., :2] + bboxes[..., 2:4]) * 0.5 + (
            pred_bboxes[..., :2] - 0.5) * stride[..., None]
        whs = (bboxes[..., 2:4] - bboxes[..., :2]) * 0.5 * jnp.exp(pred_bboxes[..., 2:4])
        return jnp.concatenate([xy_centers - whs, xy_centers + whs], axis=-1)


@BBOX_CODERS.register_module()
class TBLRBBoxCoder:
    """Top-bottom-left-right coder (reference
    core/bbox/coder/tblr_bbox_coder.py; FSAF-family heads)."""

    def __init__(self, normalizer=4.0, clip_border=True):
        self.normalizer = normalizer
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        t = py - gt_bboxes[..., 1]
        b = gt_bboxes[..., 3] - py
        l = px - gt_bboxes[..., 0]
        r = gt_bboxes[..., 2] - px
        wh = jnp.stack([bboxes[..., 2] - bboxes[..., 0],
                        bboxes[..., 3] - bboxes[..., 1]], -1)
        wh = jnp.maximum(wh, 1e-6)
        return jnp.stack([t, b, l, r], -1) / (
            jnp.concatenate([wh[..., 1:2], wh[..., 1:2],
                             wh[..., 0:1], wh[..., 0:1]], -1) * self.normalizer)

    def decode(self, bboxes, deltas, max_shape=None):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        t, b, l, r = (deltas[..., 0] * h * self.normalizer,
                      deltas[..., 1] * h * self.normalizer,
                      deltas[..., 2] * w * self.normalizer,
                      deltas[..., 3] * w * self.normalizer)
        out = jnp.stack([px - l, py - t, px + r, py + b], -1)
        if self.clip_border and max_shape is not None:
            hh, ww = max_shape[0], max_shape[1]
            out = jnp.stack([jnp.clip(out[..., 0], 0, ww),
                             jnp.clip(out[..., 1], 0, hh),
                             jnp.clip(out[..., 2], 0, ww),
                             jnp.clip(out[..., 3], 0, hh)], -1)
        return out


@BBOX_CODERS.register_module()
class DistancePointBBoxCoder:
    """Point-distance coder (reference distance_point_bbox_coder.py; FCOS)."""

    def __init__(self, clip_border=True):
        self.clip_border = clip_border

    def encode(self, points, gt_bboxes, max_dis=None, eps=0.1):
        l = points[..., 0] - gt_bboxes[..., 0]
        t = points[..., 1] - gt_bboxes[..., 1]
        r = gt_bboxes[..., 2] - points[..., 0]
        b = gt_bboxes[..., 3] - points[..., 1]
        d = jnp.stack([l, t, r, b], -1)
        if max_dis is not None:
            d = jnp.clip(d, 0, max_dis - eps)
        return d

    def decode(self, points, distances, max_shape=None):
        from .transforms import distance2bbox
        return distance2bbox(points, distances, max_shape)


@BBOX_CODERS.register_module()
class PseudoBBoxCoder:
    """reference pseudo_bbox_coder.py: identity encode/decode."""

    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred_bboxes, max_shape=None, **kw):
        return pred_bboxes


@BBOX_CODERS.register_module()
class LegacyDeltaXYWHBBoxCoder(DeltaXYWHBBoxCoder):
    """reference legacy_delta_xywh_bbox_coder.py: mmdet-v1 convention with
    the +1 width/height term."""

    def encode(self, bboxes, gt_bboxes):
        import jax.numpy as jnp
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0] + 1.0
        ph = bboxes[..., 3] - bboxes[..., 1] + 1.0
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1.0
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1.0
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
        return (deltas - self.means) / self.stds


@BBOX_CODERS.register_module()
class BucketingBBoxCoder:
    """Config-surface entry (reference bucketing_bbox_coder.py); the
    bucket-cls + in-bucket-offset implementation lives in
    models/dense_heads/guided_sabl_heads.py (SABLRetinaHead)."""

    def __init__(self, num_buckets=14, scale_factor=3.0, **kw):
        self.num_buckets = num_buckets
        self.scale_factor = scale_factor
