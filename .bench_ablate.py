import time, sys
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

def timeit(name, oacfg):
    pp = jax.jit(make_oadg_preprocess(oacfg, dict(cfg.img_norm_cfg)))
    out = pp(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(6):
        t0 = time.time()
        out = pp(batch, jax.random.PRNGKey(i))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[..., 0, 0] if leaf.ndim > 2 else leaf))
        ts.append(time.time() - t0)
    print(name, round(sorted(ts)[len(ts)//2] * 1000, 1), "ms", flush=True)

base = dict(cfg.oamix_config)
print("base cfg keys:", {k: v for k, v in base.items() if not isinstance(v, (list, dict))}, flush=True)
timeit("full", base)
timeit("width1", dict(base, mixture_width=1))
timeit("depth1", dict(base, mixture_depth=1))
timeit("version_aug_none", dict(base, aug_list="none") if "aug_list" in base else dict(base))
