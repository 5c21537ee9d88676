import time, sys, functools
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
import jax.numpy as jnp, numpy as np
from oadg_tpu.ops.pallas_warp import shear_rows, shear_rows_block, shear_rows_v3, shear_rows_xla
h, w, c = 1024, 2048, 3
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(h, w, c).astype(np.float32) * 255)
shifts = jnp.asarray(np.round(np.linspace(-100, 100, h)).astype(np.int32))
fracs = jnp.asarray(rng.rand(h).astype(np.float32))
N = 50
for name, fn in [("old", shear_rows), ("block", shear_rows_block), ("v3", shear_rows_v3), ("xla", shear_rows_xla)]:
    @jax.jit
    def many(x):
        def body(i, acc):
            return fn(acc, shifts, fracs, 128) * (1.0 / 255.0) + x * 0.5
        return jax.lax.fori_loop(0, N, body, x)
    out = many(img); out.block_until_ready()
    ts = []
    for i in range(5):
        t0 = time.time(); many(img).block_until_ready(); ts.append(time.time() - t0)
    t = sorted(ts)[2]
    print(name, round(t / N * 1000, 3), "ms/pass", flush=True)
