import time, sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_model_cfg, _train_batch
cfg, model = _flagship_model_cfg(tiny=False)
b, h, w = 2, 1024, 2048
batch = _train_batch(b, h, w, g=16)
rng0 = np.random.RandomState(1)
batch["img_raw"] = jnp.asarray(rng0.randint(0, 256, (b, h, w, 3)).astype(np.float32))

def timeit(name):
    # fresh import-level env must be set before tracing
    import importlib
    import oadg_tpu.ops.oamix_device as od
    importlib.reload(od)
    import oadg_tpu.engine.preprocess as pre
    importlib.reload(pre)
    pp = jax.jit(pre.make_oadg_preprocess(dict(cfg.oamix_config), dict(cfg.img_norm_cfg)))
    out = pp(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(6):
        t0 = time.time()
        out = pp(batch, jax.random.PRNGKey(i))
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(name, round(sorted(ts)[3] * 1000, 1), "ms", flush=True)

timeit("full")
os.environ["OAMIX_SKIP_MIX"] = "1"
timeit("no_mix")
os.environ["OAMIX_SKIP_CHAIN"] = "1"
timeit("no_mix_no_chain")
del os.environ["OAMIX_SKIP_MIX"]
timeit("no_chain")
