"""Per-primitive timing at full res (1024,2048,3) with chained-dependent
jit calls (honest under the axon tunnel)."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
from oadg_tpu.ops.photometric import autocontrast, equalize, posterize, solarize
from oadg_tpu.ops import oamix_device as od

H, W = 1024, 2048
img0 = jnp.asarray(np.random.RandomState(0).randint(0, 255, (H, W, 3)), jnp.float32)
boxes = jnp.asarray(np.random.RandomState(1).rand(16, 4), jnp.float32)
boxes = jnp.concatenate([boxes[:, :2] * 500, boxes[:, :2] * 500 + 100 + boxes[:, 2:] * 200], -1)
valid = jnp.ones((16,), bool)

def timeit(name, fn, n=8):
    f = jax.jit(fn)
    x = f(img0)
    float(x.sum())          # sync
    t0 = time.perf_counter()
    x = img0
    for _ in range(n):
        x = f(x)
    s = float(x.sum())      # chain + fetch
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:7.2f} ms")

timeit("autocontrast", lambda x: autocontrast(x))
timeit("equalize", lambda x: equalize(x))
timeit("posterize", lambda x: posterize(x, jnp.int32(3)))
timeit("solarize", lambda x: solarize(x, jnp.int32(128)))

# fg maps precompute
f_pre = jax.jit(lambda b: od._precompute_fg_maps(b, valid, H, W, 0.3))
r = f_pre(boxes); jax.block_until_ready(r); float(r[1].astype(jnp.float32).sum())
t0 = time.perf_counter()
for i in range(4):
    r = f_pre(boxes + i)
    s = float(r[1].astype(jnp.float32).sum())
print(f"{'precompute_fg_maps':28s} {(time.perf_counter()-t0)/4*1000:7.2f} ms")

best_id, cover, union = r
fg = od._FgInfo(boxes, valid, jnp.zeros(16), best_id, cover, union)
inv = jnp.tile(jnp.asarray([[1.0, 0.02, -5.0, 0.01, 1.0, 3.0]]), (16, 1))
timeit("geo_bboxes_only(2-pass)", lambda x: od._apply_geo_bboxes_only(x, fg, inv))

# bg pallas warp via full _aug_once with forced op
key = jax.random.PRNGKey(0)
shape = jnp.asarray([H, W], jnp.float32)
for opi, nm in [(0,"aug_once:autoc"), (1,"aug_once:equalize"), (4,"aug_once:geo_bbox"),
                (7,"aug_once:bg_rotate"), (8,"aug_once:bg_shear"), (9,"aug_once:bg_translate")]:
    timeit(f"{nm}", functools.partial(
        lambda x, o: od._aug_once(x, key, jnp.int32(o), fg, shape, 10.0, "augmix").astype(jnp.float32), o=opi))
