"""Probe: violator statistics of the rois that reach RoIAlign in the
flagship bench step (sampled proposals + random proposals)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_model_cfg, _train_batch, _train_batch_device
from oadg_tpu.engine.preprocess import make_oadg_preprocess
from oadg_tpu.models import build_detector

cfg, model = _flagship_model_cfg(tiny=False)
num_views = int(cfg.get("num_views", 2))
det = build_detector(model, num_views=num_views, dtype=jnp.bfloat16)
b, h, w = 2, 1024, 2048
batch = _train_batch_device(b, h, w, g=16, raw=True)
preprocess = make_oadg_preprocess(dict(cfg.oamix_config), dict(cfg.img_norm_cfg))
init_batch = _train_batch(num_views, 64, 64, g=4)
variables = jax.jit(lambda rngs, bb: det.init(rngs, bb, "train"))(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, init_batch)

def probe(vars_, batch, rng):
    rng, pk = jax.random.split(rng)
    batch = preprocess(batch, pk)
    m = det.bind(vars_, rngs={"sampling": rng})
    feats = m.extract_feat(batch["img"])
    cls_scores, bbox_preds = m.rpn(feats)
    proposal_cfg = dict(dict(model.get("train_cfg") or {}).get("rpn_proposal", {}))
    bb = batch["img"].shape[0] // num_views
    prop_boxes, _, prop_valid = m.rpn.get_proposals(
        [s[:bb] for s in cls_scores], [p[:bb] for p in bbox_preds],
        batch["img_shape"][:bb], proposal_cfg)
    # sample like the roi head
    roi = m.roi
    keys = jax.random.split(rng, bb)
    boxes, labels, is_pos, valid, matched_gt, _ = jax.vmap(roi._sample_one)(
        keys, prop_boxes, prop_valid, batch["gt_bboxes"][:bb],
        batch["gt_valid"][:bb], batch["gt_labels"][:bb])
    n, p = boxes.shape[:2]
    bidx = jnp.repeat(jnp.arange(n, dtype=jnp.float32), p).reshape(n, p)
    rois = jnp.concatenate([bidx[..., None], boxes], -1).reshape(-1, 5)
    # compact stats at several window sizes
    from oadg_tpu.ops.roi_align import map_roi_levels
    lvl = map_roi_levels(rois, 4, 56)
    sc = jnp.asarray([0.25, 0.125, 0.0625, 0.03125])[lvl]
    wpx = (rois[:, 3] - rois[:, 1]) * sc
    hpx = (rois[:, 4] - rois[:, 2]) * sc
    span_x = wpx * 13.0 / 14.0 + 1
    span_y = hpx * 13.0 / 14.0 + 1
    return rois, span_x, span_y, valid.reshape(-1)

probe_j = jax.jit(probe)
t0 = time.perf_counter()
rois, sx, sy, valid = probe_j(variables, batch, jax.random.PRNGKey(7))
sx, sy = np.asarray(sx), np.asarray(sy)
print("probe compile+run", time.perf_counter() - t0)
v = np.asarray(valid)
print("rois:", len(sx), "valid:", v.sum())
for wn in (16, 24, 32):
    c = ((sx < wn) & (sy < wn))
    print(f"win {wn}x{wn}: compact {100*c.mean():.1f}%")
c1616 = (sx < 16) & (sy < 16)
c328 = (sx < 32) & (sy < 8)
c832 = (sx < 8) & (sy < 32)
c = c1616 | c328 | c832
print(f"16x16 or 32x8 or 8x32: {100*c.mean():.1f}%  (pure 16x16 {100*c1616.mean():.1f}%)")
c3216t = (np.maximum(sx,sy) < 32) & (np.minimum(sx,sy) < 16)
print(f"transposed 32x16 pair: {100*c3216t.mean():.1f}%")
c3208t = (np.maximum(sx,sy) < 32) & (np.minimum(sx,sy) < 8)
print(f"transposed 32x8 pair: {100*c3208t.mean():.1f}%")
print("span percentiles x:", np.percentile(sx, [50, 90, 99, 99.9]).round(1),
      "y:", np.percentile(sy, [50, 90, 99, 99.9]).round(1))
print("max span:", sx.max(), sy.max())

# ---- violator-pass coverage on the REAL roi mix (sampled + random
# proposals for the contrastive head, both views), matching _ml_bwd ----
from oadg_tpu.ops.roi_align import _window_meta, _violator_window_meta

def coverage(vars_, batch, rng):
    rng, pk = jax.random.split(rng)
    batch = preprocess(batch, pk)
    m = det.bind(vars_, rngs={"sampling": rng})
    feats = m.extract_feat(batch["img"])
    cls_scores, bbox_preds = m.rpn(feats)
    proposal_cfg = dict(dict(model.get("train_cfg") or {}).get("rpn_proposal", {}))
    bb = batch["img"].shape[0] // num_views
    prop_boxes, _, prop_valid = m.rpn.get_proposals(
        [s[:bb] for s in cls_scores], [p[:bb] for p in bbox_preds],
        batch["img_shape"][:bb], proposal_cfg)
    roi = m.roi
    keys = jax.random.split(rng, bb)
    boxes, labels, is_pos, valid, matched_gt, _ = jax.vmap(roi._sample_one)(
        keys, prop_boxes, prop_valid, batch["gt_bboxes"][:bb],
        batch["gt_valid"][:bb], batch["gt_labels"][:bb])
    rnd_boxes, rnd_valid = m._random_proposals(
        {k: (v[:bb] if hasattr(v, "shape") else v) for k, v in batch.items()},
        rng)
    all_boxes = [boxes]
    if rnd_boxes is not None:
        all_boxes.append(rnd_boxes)
    stats = {}
    shapes = [(f.shape, f.dtype) for f in feats]
    hs = np.array([sh[0][1] for sh in shapes])
    ws = np.array([sh[0][2] for sh in shapes])
    level_off = np.concatenate([[0], np.cumsum(shapes[0][0][0] * hs * ws)[:-1]])
    for name, bx in (("sampled", boxes),
                     ("random", rnd_boxes if rnd_boxes is not None else boxes)):
        n, p = bx.shape[:2]
        bidx = jnp.repeat(jnp.arange(n, dtype=jnp.float32), p).reshape(n, p)
        rois = jnp.concatenate([bidx[..., None], bx], -1).reshape(-1, 5)
        _, _, _, compact, _ = _window_meta(
            rois, 7, (4, 8, 16, 32), 56, 2, hs, ws, level_off, shapes)
        viol = ~compact
        V = min(256, rois.shape[0])
        _, vidx = jax.lax.top_k(viol.astype(jnp.float32), V)
        vsel = viol[vidx]
        passA, passB, _ = _violator_window_meta(
            rois[vidx], 7, (4, 8, 16, 32), 56, 2, hs, ws, level_off, shapes)
        h_any = jnp.zeros_like(vsel)
        for pp in (passA, passB):
            if pp is not None:
                h_any = h_any | (pp["handled"] & vsel)
        remaining = viol & ~jnp.zeros_like(viol).at[vidx].set(h_any)
        stats[name] = (rois.shape[0], jnp.sum(viol), jnp.sum(remaining))
    return stats

if os.environ.get("PROBE_COVERAGE"):
    cov_j = jax.jit(coverage)
    for seed in (11, 12, 13, 14):
        st = cov_j(variables, batch, jax.random.PRNGKey(seed))
        for name, (tot, nv, nr) in st.items():
            print(f"seed {seed} {name}: rois={int(tot)} violators={int(nv)} "
                  f"remaining_after_passAB={int(nr)}")
