import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
from oadg_tpu.ops import oamix_device as od
H, W, G = 1024, 2048, 16
boxes = jnp.asarray(np.random.RandomState(1).rand(G, 4), jnp.float32)
boxes = jnp.concatenate([boxes[:, :2] * 500, boxes[:, :2] * 500 + 100 + boxes[:, 2:] * 200], -1)
valid = jnp.ones((G,), bool)

def reps(n):
    @jax.jit
    def chain(b0):
        s = jnp.float32(0.0)
        for i in range(n):
            r = od._precompute_fg_maps(b0 + s * 1e-12 + 0.1 * i, valid, H, W, 0.3)
            s = r[1].astype(jnp.float32).sum() + r[2].astype(jnp.float32).sum()
        return s
    float(chain(boxes))             # compile+warm
    t0 = time.perf_counter()
    float(chain(boxes))
    return time.perf_counter() - t0

t8, t24 = reps(8), reps(24)
print(f"8 reps: {t8*1000:.1f} ms   24 reps: {t24*1000:.1f} ms   per-rep: {(t24-t8)/16*1000:.2f} ms")
