import time, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_model_cfg, _train_batch
from oadg_tpu.engine.preprocess import make_oadg_preprocess
cfg, model = _flagship_model_cfg(tiny=False)
b, h, w = 2, 1024, 2048
batch = _train_batch(b, h, w, g=16)
rng0 = np.random.RandomState(1)
batch["img_raw"] = jnp.asarray(rng0.randint(0, 256, (b, h, w, 3)).astype(np.float32))
preprocess = make_oadg_preprocess(dict(cfg.oamix_config), dict(cfg.img_norm_cfg))
pp = jax.jit(preprocess)
key = jax.random.PRNGKey(0)
t0 = time.time()
out = pp(batch, key)
jax.tree_util.tree_map(lambda x: x.block_until_ready() if hasattr(x, 'block_until_ready') else x, out)
print("preprocess compile+1st:", round(time.time() - t0, 2), "s", flush=True)
ts = []
for i in range(8):
    t0 = time.time()
    out = pp(batch, jax.random.PRNGKey(i))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[..., 0, 0] if leaf.ndim > 2 else leaf))  # force sync
    ts.append(time.time() - t0)
print("preprocess median:", round(sorted(ts)[len(ts)//2] * 1000, 1), "ms", flush=True)
