"""Drive script (session verify): RoIAlign exact-pass shrink + the
normalize-on-device loader contract, end to end on CPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

# ---- surface 1: roi_align_multilevel jit+grad, violator-heavy rois ----
from oadg_tpu.ops.roi_align import roi_align_multilevel

b, c = 2, 32
feats = [jnp.asarray(np.random.RandomState(l).randn(b, 64 // 2**l, 128 // 2**l, c),
                     jnp.bfloat16) for l in range(4)]
rng = np.random.RandomState(7)
# mix: normal rois + extreme-aspect slivers that defeat every window class
norm = rng.uniform(0, 200, (40, 4))
norm = np.stack([np.minimum(norm[:, 0], norm[:, 2]), np.minimum(norm[:, 1], norm[:, 3]),
                 np.maximum(norm[:, 0], norm[:, 2]) + 8, np.maximum(norm[:, 1], norm[:, 3]) + 8], 1)
sliv = np.array([[0.0, 10.0, 500.0, 18.0], [4.0, 0.0, 20.0, 250.0],
                 [0.0, 0.0, 510.0, 12.0]])
boxes = np.concatenate([norm, sliv], 0)
bidx = rng.randint(0, b, (len(boxes), 1)).astype(np.float32)
rois = jnp.asarray(np.concatenate([bidx, boxes], 1), jnp.float32)

def f(feats, rois):
    out = roi_align_multilevel(feats, rois, output_size=7,
                               featmap_strides=(4, 8, 16, 32))
    return jnp.sum(out.astype(jnp.float32) ** 2)

v, g = jax.jit(jax.value_and_grad(f))(feats, rois)
print("roi_align value:", float(v), "grad finite:",
      all(bool(jnp.all(jnp.isfinite(x))) for x in g))
# parity vs the chunked XLA impl (OADG_ROI_FWD path is auto->gather on CPU
# already; compare against exact_small on the sliver subset)
from oadg_tpu.ops.roi_align import _roi_align_exact_small
sub = _roi_align_exact_small(feats, rois[-3:], 7, (4, 8, 16, 32), 2, 56)
full = roi_align_multilevel(feats, rois, output_size=7,
                            featmap_strides=(4, 8, 16, 32))
err = float(jnp.max(jnp.abs(full[-3:].astype(jnp.float32) - sub)))
print("sliver parity max err:", err)
assert err < 2e-2, err

# ---- surface 2: end-to-end loader -> preprocess -> train step ----
import os, sys, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools", "analysis_tools"))
from bench_dataloader import make_dataset_on_disk, flagship_host_pipeline
from oadg_tpu.data.builder import build_dataloader, build_dataset

root = tempfile.mkdtemp(prefix="oadg_verify_")
ann, img_dir = make_dataset_on_disk(root, 4, hw=(128, 128))
pipe = flagship_host_pipeline()
for p in pipe:                       # keep the drive tiny: no upscale
    if p["type"] == "Resize":
        p["img_scale"] = (128, 128)
ds = build_dataset(dict(type="CocoDataset", ann_file=ann, img_prefix=img_dir,
                        classes=tuple(f"c{cc}" for cc in range(1, 9)),
                        pipeline=pipe,
                        filter_empty_gt=False))
loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=1,
                          dist=False, shuffle=False, seed=0,
                          static_hw=(128, 128), max_gt=16, rank=0,
                          world_size=1)
batch = next(iter(loader))
assert "img" not in batch, "norm-on-device collate must not ship img"
assert batch["img_raw"].dtype == np.uint8, batch["img_raw"].dtype
print("collate: img_raw uint8", batch["img_raw"].shape, "no host img: OK")

from oadg_tpu.engine.preprocess import make_oadg_preprocess
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
pre = make_oadg_preprocess(dict(version="augmix", num_views=2, severity=10),
                           img_norm_cfg)
dev_batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "metas"}
outb = jax.jit(pre)(dev_batch, jax.random.PRNGKey(0))
print("preprocess out img:", outb["img"].shape, outb["img"].dtype)
# the device clean view must equal the old host Normalize math
mean = np.asarray(img_norm_cfg["mean"], np.float32)
std = np.asarray(img_norm_cfg["std"], np.float32)
want = (batch["img_raw"][..., ::-1].astype(np.float32) - mean) / std
got = np.asarray(outb["img"][:2], np.float32)
err = np.abs(got - want).max()
print("device clean-view vs host Normalize max err:", err)
assert err < 1e-4, err

# tiny real train step through make_train_step with the new batch
from oadg_tpu.models import build_detector
from oadg_tpu.engine.optim import build_lr_schedule, build_optimizer
from oadg_tpu.engine.train_step import make_train_step
from __graft_entry__ import _flagship_model_cfg, _train_batch

cfg, model = _flagship_model_cfg(tiny=True)
det = build_detector(model, num_views=2, dtype=jnp.float32)
init_batch = _train_batch(2, 64, 64, g=4)
variables = jax.jit(lambda bb: det.init(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    bb, "train"))(init_batch)
params = variables["params"]
sched = build_lr_schedule(cfg.get("lr_config"), cfg.optimizer["lr"], 10)
tx = build_optimizer(params, cfg.optimizer, sched, model_cfg=model)
opt_state = tx.init(params)
step = make_train_step(det, tx, mesh=None, donate=False, preprocess=pre)
params, bs, opt_state, log_vars = step(params, variables.get("batch_stats"),
                                       opt_state, dev_batch,
                                       jax.random.PRNGKey(3))
print("train step loss:", float(log_vars["loss"]),
      {k: round(float(v), 4) for k, v in log_vars.items()})
assert np.isfinite(float(log_vars["loss"]))
print("VERIFY OK")
