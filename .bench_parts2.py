import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np
from __graft_entry__ import _flagship_model_cfg, _train_batch
from oadg_tpu.engine.preprocess import make_oadg_preprocess

cfg, model = _flagship_model_cfg(tiny=False)
b, h, w = 2, 1024, 2048
batch = _train_batch(b, h, w, g=16)
rng0 = np.random.RandomState(1)
batch["img_raw"] = jnp.asarray(rng0.randint(0, 256, (b, h, w, 3)).astype(np.float32))
preprocess = make_oadg_preprocess(dict(cfg.oamix_config), dict(cfg.img_norm_cfg))

def timed(n):
    @jax.jit
    def chain(bb, key):
        s = jnp.float32(0.0)
        for i in range(n):
            b2 = dict(bb)
            b2["img_raw"] = bb["img_raw"] + s * 1e-20
            out = preprocess(b2, jax.random.fold_in(key, i))
            s = out["img"].astype(jnp.float32).mean()
        return s
    k = jax.random.PRNGKey(0)
    float(chain(batch, k))
    t0 = time.perf_counter()
    float(chain(batch, k))
    return time.perf_counter() - t0

t2, t6 = timed(2), timed(6)
tag = os.environ.get("OAMIX_FORCE_OP", "mix")
print(f"op={tag}: per-rep {(t6-t2)/4*1000:.1f} ms", flush=True)
