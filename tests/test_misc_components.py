"""Tests for the last inventory stragglers: CascadeRPNHead, ResLayer shared
head, nms_match, Mosaic/MixUp/RandomAffine pipeline ops, DCN-enabled ResNet
stages, greedy device matcher parity."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import oadg_tpu  # noqa: F401
from oadg_tpu.utils.registry import (BACKBONES, HEADS, PIPELINES,
                                     build_from_cfg)

KEY = jr.PRNGKey(0)


def test_cascade_rpn_head_loss_and_proposals():
    h = build_from_cfg(dict(type="CascadeRPNHead", in_channels=16,
                            feat_channels=16), HEADS)
    feats = [jnp.zeros((2, 32 // 2 ** i, 40 // 2 ** i, 16))
             for i in range(5)]
    var = jax.jit(lambda f: h.init(KEY, f))(feats)
    outs = h.apply(var, feats)
    gt = jnp.asarray(np.array([[[2., 2., 60., 60.],
                                [10., 10., 30., 40.]]] * 2))
    gtv = jnp.ones((2, 2), bool)
    losses = h.apply(var, outs, gt, gtv, method=h.loss)
    assert set(losses) == {"loss_rpn_reg_s1", "loss_rpn_cls",
                           "loss_rpn_reg_s2"}
    assert all(bool(jnp.isfinite(v)) for v in losses.values())
    cls2s, reg2s, reg1s = outs
    boxes, scores, valid = h.apply(
        var, cls2s, reg2s, jnp.asarray([[128., 160.]] * 2),
        dict(nms_pre=50, max_per_img=20), reg1s=reg1s,
        method=h.get_proposals)
    assert boxes.shape == (2, 20, 4)


def test_res_layer_shared_head():
    rl = build_from_cfg(dict(type="ResLayer", depth=50), HEADS)
    x = jnp.zeros((4, 7, 7, 1024))
    var = jax.jit(lambda a: rl.init(KEY, a))(x)
    y = rl.apply(var, x)
    assert y.shape == (4, 4, 4, 2048)


def test_nms_match_groups():
    from oadg_tpu.core.post_processing.nms import nms_match
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    m = np.asarray(nms_match(boxes, scores, 0.5))
    assert list(m) == [0, 0, 2]


def test_dcn_resnet_stage():
    bb = build_from_cfg(dict(type="ResNet", depth=50, base_channels=8,
                             stem_channels=8,
                             dcn=dict(type="DCNv2", deform_groups=1),
                             stage_with_dcn=(False, True, True, True)),
                        BACKBONES)
    x = jnp.zeros((1, 64, 64, 3))
    var = jax.jit(lambda a: bb.init(KEY, a))(x)
    outs = bb.apply(var, x)
    assert outs[3].shape == (1, 2, 2, 256)
    # DCNv2 params exist in stage 2+ but not stage 1
    flat = jax.tree_util.tree_flatten_with_path(var["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("layer2_0" in n and "conv_offset" in n for n in names)
    assert not any("layer1_0" in n and "conv_offset" in n for n in names)


def _sample(rng, h=100, w=120):
    return dict(img=rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
                gt_bboxes=np.array([[5., 5., 50., 60.],
                                    [30., 20., 90., 80.]], np.float32),
                gt_labels=np.array([1, 2]), img_shape=(h, w, 3),
                bbox_fields=["gt_bboxes"], img_fields=["img"])


def test_mosaic_mixup_affine():
    rng = np.random.RandomState(0)
    m = build_from_cfg(dict(type="Mosaic", img_scale=(96, 96)), PIPELINES)
    r = _sample(rng)
    r["mix_results"] = [_sample(rng, 80, 90), _sample(rng, 110, 70),
                        _sample(rng, 64, 64)]
    out = m(r)
    assert out["img"].shape == (192, 192, 3)
    assert (out["gt_bboxes"][:, 2] >= out["gt_bboxes"][:, 0]).all()
    assert len(out["gt_bboxes"]) == len(out["gt_labels"])

    mu = build_from_cfg(dict(type="MixUp"), PIPELINES)
    r = _sample(rng)
    r["mix_results"] = [_sample(rng, 90, 100)]
    out = mu(r)
    assert out["img"].shape == (100, 120, 3)
    assert len(out["gt_bboxes"]) == 4

    ra = build_from_cfg(dict(type="RandomAffine"), PIPELINES)
    out = ra(_sample(rng))
    assert out["img"].shape == (100, 120, 3)
    assert (out["gt_bboxes"][:, 0] >= 0).all()


def test_greedy_matcher_matches_scipy_on_separated_costs():
    from oadg_tpu.core.bbox.hungarian import _greedy_assign_device, _lsa_host
    rng = np.random.RandomState(3)
    q, g = 12, 5
    # well-separated costs: greedy == optimal
    cost = rng.rand(q, g) * 0.1
    for j in range(g):
        cost[j + 2, j] = -10.0 - j
    gv = np.ones((g,), bool)
    got = np.asarray(_greedy_assign_device(jnp.asarray(cost, jnp.float32),
                                           jnp.asarray(gv)))
    ref = _lsa_host(cost.astype(np.float32), np.int32(g))
    assert (got == ref).all()
