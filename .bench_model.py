import time, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp, numpy as np, jax.random as jr
from __graft_entry__ import _flagship_model_cfg, _train_batch
from oadg_tpu.models import build_detector
cfg, model = _flagship_model_cfg(tiny=False)
det = build_detector(model, num_views=2, dtype=jnp.bfloat16)
b, h, w = 4, 1024, 2048   # views-major batch (2 clean x 2 views)
batch = _train_batch(2, h, w, g=16)
# emulate post-preprocess batch: views-major images
vb = dict(batch)
vb["img"] = jnp.zeros((b, h, w, 3), jnp.bfloat16)
for k in ("gt_bboxes", "gt_valid", "gt_labels"):
    vb[k] = jnp.concatenate([batch[k]] * 2, 0)
vb["img_shape"] = jnp.concatenate([batch["img_shape"]] * 2, 0)
init_b = dict(vb)
var = jax.jit(lambda bb: det.init({'params': jr.PRNGKey(0), 'sampling': jr.PRNGKey(1)}, bb))(init_b)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for i in range(6):
        t0 = time.time(); out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(name, round(sorted(ts)[3] * 1000, 1), "ms", flush=True)

# backbone+neck forward
feat_fn = jax.jit(lambda v, im: det.apply(v, im, method=det.extract_feat))
timeit("extract_feat fwd", feat_fn, var, vb["img"])
# full train loss forward
loss_fn = jax.jit(lambda v, bb: det.apply(v, bb, mode="train", rngs={'sampling': jr.PRNGKey(2)}))
timeit("loss fwd", loss_fn, var, vb)
# fwd+bwd
def lf(v, bb):
    losses = det.apply(v, bb, mode="train", rngs={'sampling': jr.PRNGKey(2)})
    return sum(jnp.sum(x) for x in losses.values())
grad_fn = jax.jit(jax.grad(lf))
timeit("fwd+bwd", grad_fn, var, vb)
# backbone-only fwd+bwd
def bf(v, im):
    f = det.apply(v, im, method=det.extract_feat)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in f)
timeit("extract_feat fwd+bwd", jax.jit(jax.grad(bf, argnums=1)), var, vb["img"])
