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
