"""Train-mode (Sync)BatchNorm (VERDICT r2 Missing #1).

Reference semantics under test:
* norm_eval=True (FrozenBN frozen=True): normalize with moving stats,
  never update — bit-identical to the round-1/2 behavior.
* norm_eval=False + mutable batch_stats: normalize with batch stats,
  fold batch stats into the moving stats with torch momentum semantics
  (new = (1-m)*old + m*batch, unbiased var stored)
  (reference mmdet/models/backbones/darknet.py:174, csp_darknet.py:189).
* Under a sharded jit the reductions run over the GLOBAL batch -> the
  updated stats are identical on every device and equal the global-batch
  statistics (SyncBN, reference mmcv SyncBatchNorm).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oadg_tpu.models.layers import FrozenBN, build_norm, norm_eval_cfg


def _mk(frozen, **kw):
    return FrozenBN(frozen=frozen, **kw)


def test_frozen_mode_ignores_mutability_and_matches_moving_stats():
    bn = _mk(True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
    v = bn.init(jax.random.PRNGKey(1), x)
    stats = {"mean": jnp.asarray([1.0, -2.0, 0.5]),
             "var": jnp.asarray([4.0, 0.25, 1.0])}
    v = {"params": v["params"], "batch_stats": stats}
    y_eval = bn.apply(v, x)
    y_train, new = bn.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_train))
    # stats untouched
    np.testing.assert_allclose(np.asarray(new["batch_stats"]["mean"]),
                               np.asarray(stats["mean"]))
    expected = (x - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_live_mode_uses_batch_stats_and_updates_running():
    bn = _mk(False, momentum=0.9)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3)) * 3.0 + 2.0
    v = bn.init(jax.random.PRNGKey(1), x)
    stats0 = {"mean": jnp.zeros(3), "var": jnp.ones(3)}
    v = {"params": v["params"], "batch_stats": stats0}
    y, new = bn.apply(v, x, mutable=["batch_stats"])
    xf = np.asarray(x, np.float64)
    m = xf.mean(axis=(0, 1, 2))
    var = xf.var(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(y), (xf - m) / np.sqrt(var + 1e-5), rtol=1e-4, atol=1e-4)
    n = 4 * 8 * 8
    np.testing.assert_allclose(np.asarray(new["batch_stats"]["mean"]),
                               0.1 * m, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * var * n / (n - 1),
                               rtol=1e-4, atol=1e-5)


def test_live_mode_without_mutable_falls_back_to_eval():
    bn = _mk(False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    v = bn.init(jax.random.PRNGKey(1), x)
    stats = {"mean": jnp.asarray([1.0, 0.0, -1.0]), "var": jnp.ones(3) * 2}
    v = {"params": v["params"], "batch_stats": stats}
    y = bn.apply(v, x)  # no mutable -> module.eval() semantics
    expected = (x - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_gradients_flow_through_batch_statistics():
    bn = _mk(False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 2)) + 5.0
    v = bn.init(jax.random.PRNGKey(1), x)

    def loss(xx):
        y, _ = bn.apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    # BN output is mean-free: shifting the input by a constant must not
    # change the loss, so the gradient sums to ~0 per channel.
    np.testing.assert_allclose(np.asarray(g).sum(axis=(0, 1, 2)),
                               np.zeros(2), atol=1e-3)


def test_syncbn_global_stats_on_mesh():
    """Live BN under a sharded jit computes GLOBAL batch statistics —
    every shard's contribution is in the updated moving stats."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    bn = _mk(False, momentum=0.0)  # momentum 0: new stats = batch stats
    # per-shard distinct data: shard i has mean ~ i
    x = np.concatenate([np.full((1, 4, 4, 2), i, np.float32)
                        for i in range(8)], axis=0)
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("data", None, None, None)))
    v = bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 2)))
    v = {"params": v["params"],
         "batch_stats": {"mean": jnp.zeros(2), "var": jnp.ones(2)}}
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(v, x):
        y, new = bn.apply(v, x, mutable=["batch_stats"])
        return y, new["batch_stats"]

    y, stats = step(jax.device_put(v, rep), xs)
    g_mean = x.mean(axis=(0, 1, 2))          # 3.5 — the GLOBAL mean
    n = x.size // 2
    g_var = x.var(axis=(0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(stats["mean"]), g_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]), g_var, rtol=1e-4)
    # the stats array is fully replicated -> identical on every device
    assert stats["mean"].sharding.is_fully_replicated


def test_build_norm_eval_flag_and_momentum_mapping():
    live = build_norm(dict(type="BN", momentum=0.03, eps=1e-3))()
    assert live.frozen is False and abs(live.momentum - 0.97) < 1e-9
    assert abs(live.eps - 1e-3) < 1e-12
    frozen = build_norm(norm_eval_cfg(dict(type="BN"), True))()
    assert frozen.frozen is True
    syncbn = build_norm(dict(type="SyncBN", requires_grad=True))()
    assert syncbn.frozen is False


def test_train_step_carries_batch_stats():
    """make_train_step returns updated stats and the runner-visible loss."""
    import flax.linen as nn
    import optax
    from oadg_tpu.engine.train_step import make_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, mode):
            x = nn.Conv(4, (3, 3), padding="SAME")(batch["img"])
            x = FrozenBN(frozen=False, name="bn")(x)
            return {"loss_x": jnp.mean(x ** 2)}

    det = Tiny()
    batch = {"img": jnp.ones((2, 8, 8, 3)) * 2.0}
    v = det.init({"params": jax.random.PRNGKey(0)}, batch, "train")
    tx = optax.sgd(0.1)
    step = make_train_step(det, tx, donate=False)
    params, stats, opt_state, log_vars = step(
        v["params"], v["batch_stats"], tx.init(v["params"]), batch,
        jax.random.PRNGKey(1))
    assert np.isfinite(float(log_vars["loss"]))
    # moving stats moved away from init (mean 0/var 1)
    leaf = jax.tree_util.tree_leaves(stats)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaf)


def test_frozen_bn_fold_matches_unfused_resnet():
    """conv_norm folds the frozen-BN affine into the conv kernel
    (models/layers.py Conv out_scale); the folded forward must equal the
    plain conv->affine sequence to f32 reassociation tolerance, with an
    IDENTICAL parameter tree (paths, shapes, creation order)."""
    import flax
    from oadg_tpu.models.backbones import resnet as R
    from oadg_tpu.models.layers import Conv

    m = R.ResNet(depth=50, num_stages=2, out_indices=(0, 1), norm_eval=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v0 = m.init(jax.random.PRNGKey(1), x)
    # randomize stats + BN affine so the fold is non-trivial
    flat = flax.traverse_util.flatten_dict(v0, sep="/")
    key = jax.random.PRNGKey(7)
    for p in list(flat):
        k = jax.random.fold_in(key, hash(p) % (2 ** 31))
        r = jax.random.normal(k, flat[p].shape, flat[p].dtype) * 0.3
        if "batch_stats" in p and p.endswith("var"):
            flat[p] = jnp.abs(r) + 0.5
        elif "batch_stats" in p and p.endswith("mean"):
            flat[p] = r
        elif "FrozenBN" in p or "downsample_bn" in p:
            flat[p] = r + 1.0
    v = flax.traverse_util.unflatten_dict(flat, sep="/")
    y_fold = m.apply(v, x)

    def unfused(x, feats, k, s, p, norm, dtype, cname, *, dilation=1,
                bn_name=None):
        conv = Conv(feats, k, s, p, dilation=dilation, use_bias=False,
                    dtype=dtype, name=cname)
        nkw = {"name": bn_name} if bn_name else {}
        return norm(**nkw)(conv(x))

    orig = R.conv_norm
    R.conv_norm = unfused
    try:
        v0u = m.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(v0u)
                == jax.tree_util.tree_structure(v0))
        y_ref = m.apply(v, x)
    finally:
        R.conv_norm = orig
    for a, b in zip(y_fold, y_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)
