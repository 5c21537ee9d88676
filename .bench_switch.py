import time, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
import jax.numpy as jnp, numpy as np
h, w, c = 1024, 2048, 3
img3 = jnp.asarray(np.random.RandomState(0).rand(h, w, c).astype(np.float32)*255).astype(jnp.bfloat16)
imgf = img3.reshape(h, w * c)
N = 30
def mk(shape_flat):
    def one(img, idx):
        branches = [lambda x: x + jnp.bfloat16(i) for i in range(10)]
        return jax.lax.switch(idx, branches, img)
    @jax.jit
    def many(img, idxs):
        def body(i, acc):
            return one(acc, idxs[i])
        return jax.lax.fori_loop(0, N, body, img)
    return many
idxs = jnp.asarray(np.random.RandomState(1).randint(0, 10, N))
for name, img in [("hwc", img3), ("flat", imgf)]:
    f = mk(None)
    out = f(img, idxs); out.block_until_ready()
    ts = []
    for i in range(5):
        t0 = time.time(); f(img, idxs).block_until_ready(); ts.append(time.time()-t0)
    print(name, round(sorted(ts)[2] / N * 1000, 3), "ms/switch", flush=True)
