"""Anchor / prior generation (numpy precompute + jnp-friendly outputs).

Matches reference mmdet/core/anchor/anchor_generator.py:13 semantics:
base anchors per level from (scales x ratios) around stride-sized cells
(ratio-major, scale-minor ordering), grid priors location-major with anchors
innermost, matching the (H, W, A, C) reshape of head predictions.

Anchor grids are *computed with jnp inside the trace* (iota + broadcast
add of the tiny base-anchor table). A host-side numpy precompute closed
over by the jitted step embeds the full (H*W*A, 4) grid as a dense
StableHLO constant — measured 33.5 MB of HLO text for the flagship
1024x2048 step (the whole rest of the program was ~1.5 MB), which every
trace/lower/cache-hash pays. Staged iota costs a few ops and fuses.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ...utils.registry import PRIOR_GENERATORS


@PRIOR_GENERATORS.register_module()
class AnchorGenerator:

    def __init__(self,
                 strides: Sequence,
                 ratios: Sequence[float],
                 scales: Sequence[float] = None,
                 base_sizes: Sequence[int] = None,
                 scale_major: bool = True,
                 octave_base_scale: int = None,
                 scales_per_octave: int = None,
                 centers: Sequence[Tuple[float, float]] = None,
                 center_offset: float = 0.):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s) for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        assert scale_major, "scale_major=False is not supported (unused by ref configs)"
        if octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = octave_scales * octave_base_scale
        else:
            self.scales = np.asarray(scales, dtype=np.float32)
        self.ratios = np.asarray(ratios, dtype=np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def gen_base_anchors(self) -> List[np.ndarray]:
        multi_level = []
        for i, base_size in enumerate(self.base_sizes):
            center = None if self.centers is None else self.centers[i]
            multi_level.append(
                self.gen_single_level_base_anchors(base_size, self.scales,
                                                   self.ratios, center))
        return multi_level

    def gen_single_level_base_anchors(self, base_size, scales, ratios, center=None):
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * w
            y_center = self.center_offset * h
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1 / h_ratios
        # scale_major: ws = (w * w_ratios[:, None] * scales[None, :]).ravel()
        ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        base_anchors = np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs,
            x_center + 0.5 * ws, y_center + 0.5 * hs
        ], axis=-1)
        return base_anchors.astype(np.float32)

    def grid_priors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        """Per-level anchors, shape (H*W*A, 4), location-major."""
        assert len(featmap_sizes) == self.num_levels
        return [
            self.single_level_grid_priors(featmap_sizes[i], i)
            for i in range(self.num_levels)
        ]

    def grid_priors_cat(self, featmap_sizes) -> jnp.ndarray:
        """All levels concatenated, (sum(H*W*A), 4)."""
        return jnp.concatenate(self.grid_priors(featmap_sizes), axis=0)

    def single_level_grid_priors(self, featmap_size, level_idx) -> jnp.ndarray:
        feat_h, feat_w = featmap_size
        stride_w, stride_h = self.strides[level_idx]
        # jnp (staged iota) on purpose — see module docstring
        shift_x = jnp.arange(0, feat_w, dtype=jnp.float32) * stride_w
        shift_y = jnp.arange(0, feat_h, dtype=jnp.float32) * stride_h
        xx = jnp.broadcast_to(shift_x[None, :], (feat_h, feat_w))
        yy = jnp.broadcast_to(shift_y[:, None], (feat_h, feat_w))
        shifts = jnp.stack([xx, yy, xx, yy], axis=-1)          # (H, W, 4)
        base = jnp.asarray(self.base_anchors[level_idx])       # (A, 4) tiny
        all_anchors = base[None, None, :, :] + shifts[:, :, None, :]
        return all_anchors.reshape(-1, 4)

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Per-level bool flags for anchors whose center cell lies inside the
        (unpadded) image region (reference anchor_generator.py valid_flags)."""
        assert len(featmap_sizes) == self.num_levels
        multi_level_flags = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape[:2]
            valid_feat_h = min(int(np.ceil(h / self.strides[i][1])), feat_h)
            valid_feat_w = min(int(np.ceil(w / self.strides[i][0])), feat_w)
            valid_x = jnp.arange(feat_w) < valid_feat_w
            valid_y = jnp.arange(feat_h) < valid_feat_h
            valid = (valid_y[:, None] & valid_x[None, :]).reshape(-1)
            valid = jnp.repeat(valid, self.num_base_anchors[i])
            multi_level_flags.append(valid)
        return multi_level_flags

    def __repr__(self):
        return (f"AnchorGenerator(strides={self.strides}, scales={self.scales.tolist()}, "
                f"ratios={self.ratios.tolist()})")


@PRIOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchors (reference mmdet/core/anchor/anchor_generator.py:498
    SSDAnchorGenerator): per-level base sizes from ``basesize_ratio_range``
    over ``input_size``; each level gets [min@1:1, sqrt(min*max)@1:1,
    min@{r, 1/r}...] — 2 + 2*len(ratios[k]) anchors, centered at stride/2.
    """

    def __init__(self, strides, ratios, input_size=300,
                 basesize_ratio_range=(0.15, 0.9), scale_major=False,
                 **kwargs):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s)
                        for s in strides]
        self.input_size = input_size
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        min_ratio, max_ratio = (int(r * 100) for r in basesize_ratio_range)
        step = int(np.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        if basesize_ratio_range[0] == 0.15:      # SSD300 COCO convention
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        elif basesize_ratio_range[0] == 0.2:     # SSD300 VOC convention
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
        self.min_sizes = min_sizes[:len(strides)]
        self.max_sizes = max_sizes[:len(strides)]
        self.level_ratios = [np.asarray(r, np.float32) for r in ratios]
        self.base_anchors = self.gen_base_anchors()

    def gen_base_anchors(self):
        multi_level = []
        for k in range(len(self.strides)):
            mn, mx = float(self.min_sizes[k]), float(self.max_sizes[k])
            cx, cy = self.centers[k]
            anchors = [(mn, mn), (np.sqrt(mn * mx), np.sqrt(mn * mx))]
            for r in self.level_ratios[k]:
                sr = np.sqrt(r)
                anchors.append((mn * sr, mn / sr))
                anchors.append((mn / sr, mn * sr))
            a = np.asarray([[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
                            for w, h in anchors], np.float32)
            multi_level.append(a)
        return multi_level
