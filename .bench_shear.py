import time, sys
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
ref = shear_rows_xla(img, shifts, fracs, 128)
for name, fn in [("old", shear_rows), ("block", shear_rows_block), ("v3", shear_rows_v3)]:
    out = fn(img, shifts, fracs, 128)
    err = float(jnp.max(jnp.abs(out - ref)))
    ts = []
    for i in range(20):
        t0 = time.time()
        out = fn(img, shifts, fracs, 128)
        out.block_until_ready() if hasattr(out, 'block_until_ready') else None
        float(jnp.sum(out[0, 0]))
        ts.append(time.time() - t0)
    print(name, "max|err|", err, "median", round(sorted(ts)[10] * 1000, 2), "ms", flush=True)
# bf16 variant
img16 = img.astype(jnp.bfloat16)
out = shear_rows_v3(img16, shifts, fracs, 128)
ts = []
for i in range(20):
    t0 = time.time()
    out = shear_rows_v3(img16, shifts, fracs, 128)
    float(jnp.sum(out[0, 0].astype(jnp.float32)))
    ts.append(time.time() - t0)
print("v3 bf16 median", round(sorted(ts)[10] * 1000, 2), "ms", flush=True)
