"""Parity tests for deformable conv & misc native-op replacements vs torch.

References: mmcv.ops.DeformConv2d / ModulatedDeformConv2d (used by
reppoints_head.py, vfnet_head.py, configs/dcn/*), CornerPool
(corner_head.py), point_sample (point_rend), RoIPool.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from oadg_tpu.ops.deform_conv import deform_conv2d, modulated_deform_conv2d
from oadg_tpu.ops.misc_ops import (carafe, corner_pool, point_sample,
                                   roi_pool)

torch = pytest.importorskip("torch")


def _to_nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


def tv_deform(x, off, wgt, bias, stride=(1, 1), padding=(0, 0), mask=None):
    """numpy reference with torchvision.ops.deform_conv2d semantics
    (torchvision isn't in this image). NCHW in/out; zero-pads OOB bilinear
    corners; offset layout (2*dg*k*k) ordered dg -> tap -> (y, x)."""
    x, off, wgt = x.numpy(), off.numpy(), wgt.numpy()
    mask = None if mask is None else mask.numpy()
    b, c, h, w = x.shape
    cout, cin, kh, kw = wgt.shape
    dg = off.shape[1] // (2 * kh * kw)
    sh, sw = stride
    ph, pw = padding
    ho, wo = off.shape[2], off.shape[3]
    out = np.zeros((b, cout, ho, wo), np.float32)

    def sample(img, yy, xx):  # img (C, H, W)
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        acc = np.zeros(img.shape[0], np.float32)
        for (yi, xi, wgt_) in [(y0, x0, (1 - (yy - y0)) * (1 - (xx - x0))),
                               (y0, x0 + 1, (1 - (yy - y0)) * (xx - x0)),
                               (y0 + 1, x0, (yy - y0) * (1 - (xx - x0))),
                               (y0 + 1, x0 + 1, (yy - y0) * (xx - x0))]:
            if 0 <= yi < h and 0 <= xi < w:
                acc += wgt_ * img[:, yi, xi]
        return acc

    cpg = c // dg
    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                col = np.zeros((c, kh * kw), np.float32)
                for g in range(dg):
                    for t in range(kh * kw):
                        ky, kx = t // kw, t % kw
                        dy = off[bi, 2 * (g * kh * kw + t), oy, ox]
                        dx = off[bi, 2 * (g * kh * kw + t) + 1, oy, ox]
                        yy = oy * sh - ph + ky + dy
                        xx = ox * sw - pw + kx + dx
                        v = sample(x[bi, g * cpg:(g + 1) * cpg], yy, xx)
                        if mask is not None:
                            v = v * mask[bi, g * kh * kw + t, oy, ox]
                        col[g * cpg:(g + 1) * cpg, t] = v
                out[bi, :, oy, ox] = np.einsum(
                    "okt,kt->o", wgt.reshape(cout, cin, kh * kw), col)
    if bias is not None:
        out += bias.numpy()[None, :, None, None]
    return torch.from_numpy(out)


@pytest.mark.parametrize("dg,stride,pad", [(1, 1, 1), (2, 2, 1)])
def test_deform_conv2d_matches_torchvision(dg, stride, pad):
    rng = np.random.RandomState(0)
    b, c, h, w, cout, k = 2, 8, 11, 13, 6, 3
    ho = (h + 2 * pad - k) // stride + 1
    wo = (w + 2 * pad - k) // stride + 1
    x = rng.randn(b, c, h, w).astype(np.float32)
    off = (rng.randn(b, 2 * dg * k * k, ho, wo) * 2).astype(np.float32)
    wgt = rng.randn(cout, c, k, k).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32)

    ref = tv_deform(torch.from_numpy(x), torch.from_numpy(off),
                    torch.from_numpy(wgt), torch.from_numpy(bias),
                    stride=(stride, stride), padding=(pad, pad)).numpy()

    got = deform_conv2d(jnp.asarray(_to_nhwc(x)),
                        jnp.asarray(_to_nhwc(off)),
                        jnp.asarray(np.transpose(wgt, (2, 3, 1, 0))),
                        stride=stride, padding=pad, deform_groups=dg,
                        bias=jnp.asarray(bias))
    np.testing.assert_allclose(_to_nhwc(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


def test_modulated_deform_conv2d_matches_torchvision():
    rng = np.random.RandomState(1)
    b, c, h, w, cout, k = 1, 4, 9, 9, 5, 3
    x = rng.randn(b, c, h, w).astype(np.float32)
    off = (rng.randn(b, 2 * k * k, h, w)).astype(np.float32)
    mask = 1 / (1 + np.exp(-rng.randn(b, k * k, h, w))).astype(np.float32)
    wgt = rng.randn(cout, c, k, k).astype(np.float32) * 0.1

    ref = tv_deform(torch.from_numpy(x), torch.from_numpy(off),
                    torch.from_numpy(wgt), None, padding=(1, 1),
                    mask=torch.from_numpy(mask)).numpy()
    got = modulated_deform_conv2d(jnp.asarray(_to_nhwc(x)),
                                  jnp.asarray(_to_nhwc(off)),
                                  jnp.asarray(_to_nhwc(mask)),
                                  jnp.asarray(np.transpose(wgt, (2, 3, 1, 0))),
                                  padding=1)
    np.testing.assert_allclose(_to_nhwc(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-4)


def test_corner_pool_directions():
    x = np.arange(24, dtype=np.float32).reshape(1, 4, 6, 1)
    x = np.ascontiguousarray(x[:, ::-1])  # make non-monotonic
    top = np.asarray(corner_pool(jnp.asarray(x), "top"))
    ref = np.maximum.accumulate(x[:, ::-1], axis=1)[:, ::-1]
    np.testing.assert_array_equal(top, ref)
    left = np.asarray(corner_pool(jnp.asarray(x), "left"))
    refl = np.maximum.accumulate(x[:, :, ::-1], axis=2)[:, :, ::-1]
    np.testing.assert_array_equal(left, refl)


def test_point_sample_matches_grid_sample():
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 7, 5, 3).astype(np.float32)
    pts = rng.uniform(0.1, 0.9, size=(2, 9, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(pts)))
    t_feats = torch.from_numpy(np.transpose(feats, (0, 3, 1, 2)))
    grid = torch.from_numpy(pts * 2 - 1).unsqueeze(2)  # (B, P, 1, 2)
    ref = torch.nn.functional.grid_sample(t_feats, grid,
                                          align_corners=False)
    ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_roi_pool_max_semantics():
    # constant feature -> pooled value equals the constant
    feats = jnp.full((1, 16, 16, 2), 3.5)
    rois = jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_pool(feats, rois, output_size=4)
    np.testing.assert_allclose(np.asarray(out), 3.5)


def test_carafe_uniform_mask_is_box_filter_upsample():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    k, s = 3, 2
    masks = np.full((1, 8, 8, k * k), 1.0 / (k * k), np.float32)
    out = np.asarray(carafe(jnp.asarray(x), jnp.asarray(masks),
                            kernel_size=k, scale_factor=s))
    assert out.shape == (1, 8, 8, 2)
    # every 2x2 output block equals the 3x3 mean around its source pixel
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    mean00 = xp[0, 0:3, 0:3, :].mean(axis=(0, 1))
    np.testing.assert_allclose(out[0, 0, 0], mean00, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[0, 1, 1], mean00, rtol=1e-5, atol=1e-5)
