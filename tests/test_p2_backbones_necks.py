"""Shape/finiteness tests for the P2 backbones (HRNet, ResNeSt, PVT v1/v2,
Hourglass, TridentResNet, DetectoRS-ResNet+SAC) and necks (NAS-FPN,
FPN-CARAFE, FPG, SSDNeck, CTResNetNeck, RFP, NASFCOS_FPN).

House style follows the reference's backbone tests
(tests/test_models/test_backbones/*): build from config dict, feed random
NHWC images, assert output level shapes.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import oadg_tpu  # noqa: F401  (registers modules)
from oadg_tpu.utils.registry import BACKBONES, NECKS, build_from_cfg

KEY = jr.PRNGKey(0)


def _run(mod, *args):
    var = jax.jit(lambda *a: mod.init(KEY, *a))(*args)
    out = jax.jit(lambda v, *a: mod.apply(v, *a))(var, *args)
    return out


HRNET_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(16,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(8, 16)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))


def test_hrnet_shapes():
    bb = build_from_cfg(dict(type="HRNet", extra=HRNET_EXTRA), BACKBONES)
    outs = _run(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 16),
                                       (1, 4, 4, 32), (1, 2, 2, 64)]
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in outs)


def test_resnest_shapes():
    bb = build_from_cfg(dict(type="ResNeSt", depth=50, base_channels=8,
                             stem_channels=8, base_width=64,
                             out_indices=(0, 3)), BACKBONES)
    outs = _run(bb, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[1].shape == (1, 2, 2, 256)


@pytest.mark.parametrize("v2", [False, True])
def test_pvt_shapes(v2):
    t = "PyramidVisionTransformerV2" if v2 else "PyramidVisionTransformer"
    bb = build_from_cfg(dict(type=t, embed_dims=(8, 16, 32, 64),
                             num_heads=(1, 2, 4, 8),
                             num_layers=(1, 1, 1, 1)), BACKBONES)
    outs = _run(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]
    assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2


def test_hourglass_shapes():
    bb = build_from_cfg(dict(type="HourglassNet", downsample_times=2,
                             num_stacks=2,
                             stage_channels=(8, 8, 16),
                             stage_blocks=(1, 1, 1), feat_channel=8),
                        BACKBONES)
    outs = _run(bb, jnp.zeros((1, 32, 32, 3)))
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 8)


def test_trident_resnet_branches():
    bb = build_from_cfg(dict(type="TridentResNet", depth=50,
                             num_branch=3, test_branch_idx=1), BACKBONES)
    outs = _run(bb, jnp.zeros((1, 64, 64, 3)))
    # train mode: 3 branches concat on batch
    assert outs[0].shape == (3, 2, 2, 2048)


def test_detectors_resnet_sac_rfp():
    bb = build_from_cfg(dict(type="DetectoRS_ResNet", depth=50,
                             base_channels=64,
                             sac=dict(type="SAC"),
                             stage_with_sac=(False, True, True, True),
                             rfp_inplanes=256, output_img=True), BACKBONES)
    x = jnp.zeros((1, 64, 64, 3))
    shapes = [(1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
              (1, 2, 2, 2048)]
    rfp = [jnp.zeros(s[:3] + (256,)) for s in shapes]
    # init must trace the rfp path so rfp_conv params exist
    var = jax.jit(lambda a, r: bb.init(KEY, a, rfp_feats=r))(x, rfp)
    outs = bb.apply(var, x)
    assert len(outs) == 5 and outs[0].shape == (1, 64, 64, 3)
    outs2 = bb.apply(var, x, rfp_feats=rfp)
    assert outs2[1].shape == outs[1].shape  # same pyramid, extra params used


@pytest.mark.parametrize("neck,extra", [
    ("NASFPN", dict(stack_times=1)),
    ("FPN_CARAFE", {}),
    ("FPG", dict(stack_times=2)),
    ("NASFCOS_FPN", dict(start_level=0)),
])
def test_pyramid_necks(neck, extra):
    cfg = dict(type=neck, in_channels=[8, 16, 32], out_channels=8,
               num_outs=5, **extra)
    nk = build_from_cfg(cfg, NECKS)
    ins = (jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)),
           jnp.zeros((1, 4, 4, 32)))
    outs = _run(nk, ins)
    assert len(outs) == 5
    assert all(o.shape[-1] == 8 for o in outs)
    assert outs[0].shape[1:3] == (16, 16)


def test_ssd_neck():
    nk = build_from_cfg(dict(type="SSDNeck", in_channels=(8, 16),
                             out_channels=(8, 16, 16, 8),
                             level_strides=(2, 2),
                             level_paddings=(1, 1)), NECKS)
    ins = (jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)))
    outs = _run(nk, ins)
    assert len(outs) == 4
    assert outs[2].shape == (1, 4, 4, 16)
    assert outs[3].shape == (1, 2, 2, 8)


def test_ct_resnet_neck():
    nk = build_from_cfg(dict(type="CTResNetNeck", in_channel=32,
                             num_deconv_filters=(16, 8),
                             num_deconv_kernels=(4, 4)), NECKS)
    outs = _run(nk, (jnp.zeros((1, 4, 4, 32)),))
    assert outs[0].shape == (1, 16, 16, 8)


def test_rfp_with_detectors_backbone():
    bb_cfg = dict(depth=50, base_channels=64, sac=dict(type="SAC"),
                  stage_with_sac=(False, True, True, True),
                  rfp_inplanes=256, output_img=True)
    rfp = build_from_cfg(dict(type="RFP",
                              in_channels=[256, 512, 1024, 2048],
                              out_channels=256, num_outs=5, rfp_steps=2,
                              rfp_backbone=dict(type="DetectoRS_ResNet",
                                                **bb_cfg)), NECKS)
    bb = build_from_cfg(dict(type="DetectoRS_ResNet", **bb_cfg), BACKBONES)
    x = jnp.zeros((1, 64, 64, 3))
    bvar = jax.jit(lambda a: bb.init(KEY, a))(x)
    feats = bb.apply(bvar, x)

    def run(f):
        var = rfp.init(KEY, f)
        return rfp.apply(var, f)
    outs = jax.jit(run)(feats)
    assert len(outs) == 5 and outs[0].shape == (1, 16, 16, 256)
