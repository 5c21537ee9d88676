import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
H, W, G = 1024, 2048, 16
fx = jnp.asarray(np.random.rand(G, W), jnp.float32)
fy = jnp.asarray(np.random.rand(G, H), jnp.float32)

def t(name, fn, n=6):
    f = jax.jit(fn)
    r = f(fx, fy); jax.block_until_ready(r)
    s = sum(float(x.astype(jnp.float32).sum()) for x in r) if isinstance(r, tuple) else float(r.sum())
    t0 = time.perf_counter()
    for i in range(n):
        r = f(fx + 1e-6 * i, fy)
        s = float((r[0] if isinstance(r, tuple) else r).astype(jnp.float32).sum())
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:7.2f} ms")

def minor(fx, fy):
    m = fy.T[:, None, :] * fx.T[None, :, :]       # (H, W, G)
    return (jnp.argmax(m, -1).astype(jnp.int8),
            1.0 - jnp.prod(1.0 - m, -1),
            jnp.max(m, -1))

def major(fx, fy):
    m = fy[:, :, None] * fx[:, None, :]           # (G, H, W)
    return (jnp.argmax(m, 0).astype(jnp.int8),
            1.0 - jnp.prod(1.0 - m, 0),
            jnp.max(m, 0))

def major_loop(fx, fy):
    def body(i, c):
        bm, bi, cov, un = c
        m = fy[i][:, None] * fx[i][None, :]
        better = m > bm
        return (jnp.maximum(bm, m), jnp.where(better, i, bi),
                cov + m - cov * m, jnp.maximum(un, m))
    z = jnp.zeros((H, W))
    bm, bi, cov, un = jax.lax.fori_loop(
        0, G, body, (z, jnp.zeros((H, W), jnp.int32), z, z))
    return bi.astype(jnp.int8), cov, un

def major_unrolled(fx, fy):
    bm = jnp.zeros((H, W)); bi = jnp.zeros((H, W), jnp.int32)
    cov = jnp.zeros((H, W)); un = jnp.zeros((H, W))
    for i in range(G):
        m = fy[i][:, None] * fx[i][None, :]
        better = m > bm
        bm = jnp.maximum(bm, m); bi = jnp.where(better, i, bi)
        cov = cov + m - cov * m; un = jnp.maximum(un, m)
    return bi.astype(jnp.int8), cov, un

t("minor-axis (H,W,G)", minor)
t("major-axis (G,H,W)", major)
t("fori_loop over G", major_loop)
t("unrolled loop over G", major_unrolled)
