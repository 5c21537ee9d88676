"""Hook semantics (reference core/hook/{ema,checkloss_hook}.py):
EMA update formula (ema = (1-m)*ema + m*p, reference ema.py momentum
convention), swap round trip, NaN-loss guard interval behavior."""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oadg_tpu.core.hook.hooks import CheckLossHook, EMAHook


class _Runner(types.SimpleNamespace):
    pass


def test_ema_update_and_swap():
    hook = EMAHook(momentum=0.1, interval=1)
    r = _Runner(iter=0, params={"w": jnp.asarray([1.0])})
    hook.after_train_iter(r, {})                 # first call: snapshot
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [1.0])

    r.iter = 1
    r.params = {"w": jnp.asarray([2.0])}
    hook.after_train_iter(r, {})                 # ema = 0.9*1 + 0.1*2
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [1.1])

    r.iter = 2
    r.params = {"w": jnp.asarray([3.0])}
    hook.after_train_iter(r, {})                 # ema = 0.9*1.1 + 0.1*3
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [1.29],
                               rtol=1e-6)

    live = r.params
    hook.swap(r)                                 # eval with EMA weights
    np.testing.assert_allclose(np.asarray(r.params["w"]), [1.29], rtol=1e-6)
    hook.swap(r)                                 # restore
    assert r.params is live


def test_ema_interval_skips():
    hook = EMAHook(momentum=0.5, interval=2)
    r = _Runner(iter=0, params={"w": jnp.asarray([1.0])})
    hook.after_train_iter(r, {})
    r.iter = 1
    r.params = {"w": jnp.asarray([100.0])}
    hook.after_train_iter(r, {})                 # iter 1 % 2 -> skipped
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [1.0])
    r.iter = 2
    hook.after_train_iter(r, {})
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [50.5])


def test_checkloss_raises_on_nan_at_interval():
    hook = CheckLossHook(interval=10)
    r = _Runner(iter=5)
    hook.after_train_iter(r, {"loss": float("nan")})   # off-interval: ok
    r.iter = 10
    with pytest.raises(FloatingPointError):
        hook.after_train_iter(r, {"loss": float("nan")})
    hook.after_train_iter(_Runner(iter=20), {"loss": 1.0})


def test_ema_lifecycle_swaps_for_eval_and_back():
    """mmcv lifecycle: EMA weights in for after_train_epoch (eval/ckpt),
    raw weights back at before_train_epoch."""
    hook = EMAHook(momentum=0.5, interval=1)
    r = _Runner(iter=0, params={"w": jnp.asarray([1.0])})
    hook.after_train_iter(r, {})
    r.iter = 1
    r.params = {"w": jnp.asarray([3.0])}
    hook.after_train_iter(r, {})                 # ema = 2.0
    hook.after_train_epoch(r)                    # swap EMA in
    np.testing.assert_allclose(np.asarray(r.params["w"]), [2.0])
    hook.before_train_epoch(r)                   # raw back
    np.testing.assert_allclose(np.asarray(r.params["w"]), [3.0])
    hook.before_train_epoch(r)                   # idempotent
    np.testing.assert_allclose(np.asarray(r.params["w"]), [3.0])


def test_exp_momentum_ema_decay():
    from oadg_tpu.core.hook.hooks import ExpMomentumEMAHook
    import math
    hook = ExpMomentumEMAHook(momentum=0.1, gamma=10, interval=1)
    r = _Runner(iter=0, params={"w": jnp.asarray([0.0])})
    hook.after_train_iter(r, {})                 # snapshot 0.0
    r.iter = 1
    r.params = {"w": jnp.asarray([1.0])}
    hook.after_train_iter(r, {})
    m = (1 - 0.1) * math.exp(-2 / 10) + 0.1      # reference ema.py:104
    np.testing.assert_allclose(np.asarray(hook.ema_params["w"]), [m],
                               rtol=1e-6)


def test_yolox_mode_switch_hook():
    from oadg_tpu.core.hook.hooks import YOLOXModeSwitchHook

    class FakeDS:
        keys = None

        def update_skip_type_keys(self, k):
            self.keys = tuple(k)

    calls = []
    ds = FakeDS()
    r = _Runner(epoch=4, max_epochs=6,
                loader=types.SimpleNamespace(dataset=ds),
                logger=types.SimpleNamespace(info=lambda *a: None),
                enable_head_l1=lambda: calls.append("l1"))
    hook = YOLOXModeSwitchHook(num_last_epochs=2)
    r.epoch = 3
    hook.before_train_epoch(r)                   # 3 < 6-2: no switch
    assert ds.keys is None and not calls
    r.epoch = 4
    hook.before_train_epoch(r)
    assert ds.keys == ("Mosaic", "RandomAffine", "MixUp")
    assert calls == ["l1"]
    hook.before_train_epoch(r)                   # fires once
    assert calls == ["l1"]


def test_sync_random_size_hook_updates_batcher():
    from oadg_tpu.core.hook.hooks import SyncRandomSizeHook
    b = types.SimpleNamespace(static_hw=(640, 640))
    r = _Runner(iter=10, loader=types.SimpleNamespace(batcher=b))
    hook = SyncRandomSizeHook(ratio_range=(14, 26), img_scale=(640, 640),
                              interval=10)
    hook.after_train_iter(r, {})
    h, w = b.static_hw
    assert h % 32 == 0 and w % 32 == 0
    assert 14 * 32 <= h <= 26 * 32
    # deterministic: same iter -> same size (rank-sync without broadcast)
    b2 = types.SimpleNamespace(static_hw=(0, 0))
    r2 = _Runner(iter=10, loader=types.SimpleNamespace(batcher=b2))
    hook.after_train_iter(r2, {})
    assert b2.static_hw == (h, w)


def test_yolox_lr_policy():
    from oadg_tpu.engine.optim import build_lr_schedule
    sched = build_lr_schedule(
        dict(policy="YOLOX", warmup="exp", by_epoch=False,
             warmup_by_epoch=True, warmup_ratio=1, warmup_iters=5,
             num_last_epochs=2, min_lr_ratio=0.05, total_epochs=10),
        base_lr=0.01, steps_per_epoch=10)
    lr0 = float(sched(0))
    lr_mid_warm = float(sched(2))
    lr_warm_end = float(sched(5))
    assert lr0 < 1e-6                            # quadratic from 0
    assert abs(lr_mid_warm - 0.01 * (2 / 5) ** 2) < 1e-9
    assert abs(lr_warm_end - 0.01) < 1e-3        # cosine start ~ base
    # flat min-lr tail over the last num_last_epochs
    assert abs(float(sched(85)) - 0.0005) < 1e-8
    assert abs(float(sched(99)) - 0.0005) < 1e-8
    # monotone non-increasing after warmup
    vals = [float(sched(t)) for t in range(5, 100, 7)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_multi_image_mix_skip_type_keys():
    from oadg_tpu.data.pipelines.mosaic_mixup import MultiImageMixDataset

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"img": np.zeros((16, 16, 3), np.float32),
                    "gt_bboxes": np.zeros((0, 4), np.float32),
                    "gt_labels": np.zeros((0,), np.int64),
                    "img_metas": {}}

    ds = MultiImageMixDataset(DS(), pipeline=[])
    ds.pipeline_cfg = [dict(type="Mosaic", img_scale=(16, 16))]
    ds.update_skip_type_keys(("Mosaic",))
    out = ds[0]                                  # Mosaic skipped: no mix
    assert "mix_results" not in out
