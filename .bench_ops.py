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
batch["img_raw"] = jnp.asarray(np.random.RandomState(1).randint(0, 256, (b, h, w, 3)).astype(np.float32))
import importlib
for op in range(10):
    os.environ["OAMIX_FORCE_OP"] = str(op)
    import oadg_tpu.ops.oamix_device as od
    importlib.reload(od)
    import oadg_tpu.engine.preprocess as pre
    importlib.reload(pre)
    pp = jax.jit(pre.make_oadg_preprocess(dict(cfg.oamix_config), dict(cfg.img_norm_cfg)))
    out = pp(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(5):
        t0 = time.time()
        out = pp(batch, jax.random.PRNGKey(i))
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print("op", op, round(sorted(ts)[2] * 1000, 1), "ms", flush=True)
