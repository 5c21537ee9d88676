import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
import jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, S = 1024, 2048

def kern(x_ref, idx_ref, o_ref):
    x = x_ref[:, :]
    idx = idx_ref[:, :]
    o_ref[:, :] = jnp.take_along_axis(x, idx, axis=1)

@jax.jit
def run(x, idx):
    return pl.pallas_call(
        kern,
        grid=(H // 8,),
        in_specs=[pl.BlockSpec((8, S), lambda i: (i, 0)),
                  pl.BlockSpec((8, S), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, S), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, S), jnp.float32),
    )(x, idx)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(H, S).astype(np.float32))
idx = jnp.asarray(rng.randint(0, S, (H, S)).astype(np.int32))
out = run(x, idx)
ref = np.take_along_axis(np.asarray(x), np.asarray(idx), 1)
print("gather ok, err", float(jnp.max(jnp.abs(out - jnp.asarray(ref)))), flush=True)
N = 50
@jax.jit
def many(x, idx):
    def body(i, acc):
        return run(acc, idx) * 0.999 + x * 0.001
    return jax.lax.fori_loop(0, N, body, x)
out = many(x, idx); out.block_until_ready()
ts = []
for i in range(5):
    t0 = time.time(); many(x, idx).block_until_ready(); ts.append(time.time() - t0)
print("pallas gather", round(sorted(ts)[2] / N * 1000, 3), "ms per (1024,2048) gather", flush=True)
