import time, sys, functools
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
import jax.numpy as jnp, numpy as np
from oadg_tpu.ops.oamix_device import (_apply_geo_bboxes_only, _FgInfo,
                                       _precompute_fg_maps, _lerp_axis)
h, w, c = 1024, 2048, 3
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(h, w, c).astype(np.float32) * 255)
boxes = jnp.asarray(rng.uniform(0, 1, (16, 4)).astype(np.float32))
boxes = jnp.stack([boxes[:, 0] * w * 0.8, boxes[:, 1] * h * 0.8,
                   boxes[:, 0] * w * 0.8 + 100 + boxes[:, 2] * 300,
                   boxes[:, 1] * h * 0.8 + 80 + boxes[:, 3] * 200], -1)
valid = jnp.ones((16,), bool)
best_id, cover, union = _precompute_fg_maps(boxes, valid, h, w, 0.3)
fg = _FgInfo(boxes, valid, jnp.ones((16,)), best_id, cover, union)
inv = jnp.asarray(rng.uniform(-0.2, 0.2, (17, 6)).astype(np.float32))
inv = inv.at[:, 0].add(1.0).at[:, 4].add(1.0)

def v1(img):   # current
    return _apply_geo_bboxes_only(img, fg, inv)

def v2(img):   # select-sum coefficient maps instead of table gather
    bid = fg.best_id.astype(jnp.int32)
    msel = jnp.zeros((h, w, 6), jnp.float32)
    for g in range(17):
        msel = jnp.where((bid == g)[..., None], inv[g], msel)
    m = msel
    xo = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = jnp.arange(h, dtype=jnp.float32)[:, None]
    e = jnp.where(jnp.abs(m[..., 4]) < 1e-3, 1e-3, m[..., 4])
    gx = ((m[..., 0] - m[..., 1] * m[..., 3] / e) * xo
          + (m[..., 1] / e) * u
          + (m[..., 2] - m[..., 1] * m[..., 5] / e))
    x0 = jnp.floor(gx)
    shifted = jnp.concatenate([img[:, 1:], jnp.zeros((h, 1, c), img.dtype)], axis=1)
    pair_x = jnp.concatenate([img, shifted], axis=-1)
    tmp = _lerp_axis(pair_x, x0.astype(jnp.int32), gx - x0, axis=1, limit=w)
    sy = m[..., 3] * xo + m[..., 4] * u + m[..., 5]
    y0 = jnp.floor(sy)
    shifted_y = jnp.concatenate([tmp[1:], jnp.zeros((1, w, c), tmp.dtype)], axis=0)
    pair_y = jnp.concatenate([tmp, shifted_y], axis=-1)
    warped = _lerp_axis(pair_y, y0.astype(jnp.int32), sy - y0, axis=0, limit=h)
    cov = fg.cover.astype(jnp.float32)[..., None]
    out = img * (1.0 - cov) + warped * cov
    return jnp.clip(jnp.round(out), 0, 255)

N = 20
for name, fn in [("v1_current", v1), ("v2_selectsum", v2)]:
    @jax.jit
    def many(x, fn=fn):
        def body(i, acc):
            return fn(acc) * (1 / 256.0) + x * 0.5
        return jax.lax.fori_loop(0, N, body, x)
    out = many(img); out.block_until_ready()
    ts = []
    for i in range(4):
        t0 = time.time(); many(img).block_until_ready(); ts.append(time.time() - t0)
    print(name, round(sorted(ts)[2] / N * 1000, 2), "ms/call", flush=True)
