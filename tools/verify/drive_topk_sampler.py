"""Drive (session verify): topk_large-backed RandomSampler inside the real
jitted OA-DG train step, end to end on CPU, plus the large-n exact path."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

# surface 1: topk_large exactness at the flagship anchor count (n=523776)
from oadg_tpu.core.bbox.assign_sample import topk_large
x = jnp.asarray(np.random.RandomState(0).rand(523776).astype(np.float32))
v0, i0 = jax.lax.top_k(x, 256)
v1, i1 = jax.jit(lambda x: topk_large(x, 256))(x)
assert (v0 == v1).all() and (i0 == i1).all(), "topk_large mismatch"
print("topk_large exact at n=523776 OK")

# surface 2: the real train step (tiny flagship wiring) — sampler runs
# inside RPN loss under jit+grad
from __graft_entry__ import _flagship_model_cfg, _train_batch
from oadg_tpu.engine.optim import build_lr_schedule, build_optimizer
from oadg_tpu.engine.train_step import make_train_step
from oadg_tpu.models import build_detector

cfg, model = _flagship_model_cfg(tiny=True)
det = build_detector(model, num_views=int(cfg.get("num_views", 2)))
batch = _train_batch(int(cfg.get("num_views", 2)) * 2, 64, 64, g=4)
variables = jax.jit(lambda r, b: det.init(r, b, "train"))(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    batch)
params = variables["params"]
bs = variables.get("batch_stats")
sched = build_lr_schedule(cfg.get("lr_config"), cfg.optimizer["lr"], 10)
tx = build_optimizer(params, cfg.optimizer, sched, model_cfg=model)
step = make_train_step(det, tx, mesh=None, donate=False)
opt = tx.init(params)
for i in range(2):
    params, bs, opt, log = step(params, bs, opt, batch, jax.random.PRNGKey(i))
    loss = float(log["loss"])
    assert np.isfinite(loss), log
    print(f"step {i}: loss={loss:.4f} (finite)")
print("train-step drive OK")
