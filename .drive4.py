import jax, jax.numpy as jnp, numpy as np, jax.random as jr
import oadg_tpu
from oadg_tpu.utils.registry import HEADS, BACKBONES, build_from_cfg
# CascadeRPNHead
h = build_from_cfg(dict(type="CascadeRPNHead", in_channels=16, feat_channels=16), HEADS)
feats = [jnp.zeros((2, 32 // (2**i), 40 // (2**i), 16)) for i in range(5)]
var = jax.jit(lambda f: h.init(jr.PRNGKey(0), f))(feats)
outs = h.apply(var, feats)
gt = jnp.asarray(np.array([[[2., 2., 60., 60.], [10., 10., 30., 40.]]] * 2))
gtv = jnp.ones((2, 2), bool)
losses = jax.jit(lambda v, o: h.apply(v, o, gt, gtv, method=h.loss))(var, outs)
print("CascadeRPN", {k: round(float(v), 3) for k, v in losses.items()}, flush=True)
cls2s, reg2s, reg1s = outs
props = h.apply(var, cls2s, reg2s, jnp.asarray([[128., 160.]] * 2),
                dict(nms_pre=50, max_per_img=20), reg1s=reg1s, method=h.get_proposals)
print("CascadeRPN proposals", [np.asarray(x).shape for x in props], flush=True)
# ResLayer shared head
rl = build_from_cfg(dict(type="ResLayer", depth=50), HEADS)
x = jnp.zeros((4, 7, 7, 1024))
v = jax.jit(lambda a: rl.init(jr.PRNGKey(0), a))(x)
y = rl.apply(v, x)
print("ResLayer", y.shape, flush=True)
assert y.shape == (4, 4, 4, 2048)
# DetectoRS_ResNeXt builds
bb = build_from_cfg(dict(type="DetectoRS_ResNeXt", depth=50, sac=dict(type="SAC"),
                         stage_with_sac=(False, True, True, True)), BACKBONES)
v = jax.jit(lambda a: bb.init(jr.PRNGKey(0), a))(jnp.zeros((1, 64, 64, 3)))
print("DetectoRS_ResNeXt ok", flush=True)
# nms_match
from oadg_tpu.core.post_processing.nms import nms_match
boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
scores = jnp.asarray([0.9, 0.8, 0.7])
m = nms_match(boxes, scores, 0.5)
print("nms_match", np.asarray(m), flush=True)
assert list(np.asarray(m)) == [0, 0, 2]
print("OK")
