"""Validate piecewise bboxes_only vs the gather path on the chip."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
import jax.numpy as jnp, numpy as np
import importlib

def run(env):
    for k in ("OAMIX_GEO_XLA",):
        os.environ.pop(k, None)
    os.environ.update(env)
    import oadg_tpu.ops.oamix_device as od
    importlib.reload(od)
    h, w = 1024, 2048
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        127 + 80 * np.sin(xx / 97.0) + 40 * np.cos(yy / 53.0),
        127 + 60 * np.sin((xx + yy) / 71.0),
        127 + 80 * np.cos(xx / 41.0) * np.sin(yy / 89.0)], -1)
    img = jnp.asarray(np.clip(img, 0, 255).astype(np.float32))
    boxes = np.array([[200., 150., 900., 700.], [1200., 300., 1900., 850.]]
                     + [[0, 0, 0, 0]] * 14, np.float32)
    valid = np.array([True, True] + [False] * 14)
    best_id, cover, union = od._precompute_fg_maps(jnp.asarray(boxes), jnp.asarray(valid), h, w, 0.3)
    fg = od._FgInfo(jnp.asarray(boxes), jnp.asarray(valid), jnp.ones((16,)), best_id, cover, union)
    outs = {}
    for fam in range(3):
        f = jax.jit(lambda im, k, fam=fam: od._aug_once(
            im.astype(jnp.bfloat16), k, jnp.int32(4 + fam), fg,
            jnp.asarray([1024., 2048.]), 10.0, "augmix").astype(jnp.float32))
        o = f(img, jax.random.PRNGKey(3))
        outs[fam] = np.asarray(o)
    return outs, np.asarray(cover)

pw, cover = run({})
xla, _ = run({"OAMIX_GEO_XLA": "1"})
for fam, name in [(0, "rotate"), (1, "shear"), (2, "translate")]:
    d = np.abs(pw[fam] - xla[fam])
    core = cover > 0.9
    print(name, "max", round(float(d.max()), 1),
          "core-mean", round(float(d[core].mean()) if core.any() else -1, 3),
          "core-p99", round(float(np.percentile(d[core], 99)) if core.any() else -1, 2),
          flush=True)
