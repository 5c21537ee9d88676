"""Device preprocess (integrate_data equivalent): views-major layout, clean
view passthrough, gt tiling, random-box fields."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oadg_tpu.engine.preprocess import make_oadg_preprocess


def test_preprocess_views_major_and_clean_passthrough():
    rng = np.random.RandomState(0)
    b, h, w, g = 2, 64, 96, 3
    raw = rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    clean_norm = (raw[..., ::-1] - mean) / std
    gt = np.asarray([[[5, 5, 40, 30], [50, 20, 90, 60], [0, 0, 0, 0]]] * b,
                    np.float32)
    batch = {
        "img": jnp.asarray(clean_norm),
        "img_raw": jnp.asarray(raw),
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(rng.randint(0, 8, (b, g)), jnp.int32),
        "gt_valid": jnp.asarray([[True, True, False]] * b),
        "img_shape": jnp.asarray([[h, w]] * b, jnp.float32),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }
    oamix_cfg = dict(version="augmix", num_views=2, keep_orig=True,
                     severity=10, mixture_width=3, spatial_ratio=4,
                     sigma_ratio=0.3)
    norm_cfg = dict(mean=mean.tolist(), std=std.tolist(), to_rgb=True)
    pre = make_oadg_preprocess(oamix_cfg, norm_cfg)
    out = jax.jit(pre)(batch, jax.random.PRNGKey(0))

    n = out["img"].shape[0]
    assert n == 2 * b                       # views-major [clean x B; aug x B]
    # clean chunk untouched (keep_orig semantics, reference oa_mix.py:192)
    np.testing.assert_allclose(np.asarray(out["img"][:b]), clean_norm,
                               rtol=1e-5, atol=1e-5)
    # aug chunk differs from clean but stays in normalized range
    aug = np.asarray(out["img"][b:])
    assert np.abs(aug - clean_norm).mean() > 0.01
    assert np.isfinite(aug).all()
    # gt replicated across views
    np.testing.assert_array_equal(np.asarray(out["gt_bboxes"][:b]),
                                  np.asarray(out["gt_bboxes"][b:]))
    np.testing.assert_array_equal(np.asarray(out["gt_valid"][:b]),
                                  np.asarray(out["gt_valid"][b:]))
    # OA box fields present with view tiling
    assert out["multilevel_boxes"].shape[0] == n
    assert out["oamix_boxes"].shape[0] == n
