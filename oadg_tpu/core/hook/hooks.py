"""Training hooks (reference mmdet/core/hook/): the subset the OA-DG
configs exercise, on the runner's hook protocol.

The runner calls: before_run, before_train_epoch, after_train_iter(runner,
log_vars), after_train_epoch, after_run. ``runner`` exposes params,
batch_stats, opt_state, epoch, iter, logger.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import HOOKS


class Hook:
    def before_run(self, runner):
        pass

    def before_train_epoch(self, runner):
        pass

    def after_train_iter(self, runner, log_vars: Dict[str, float]):
        pass

    def after_train_epoch(self, runner):
        pass

    def after_run(self, runner):
        pass


@HOOKS.register_module()
class CheckLossHook(Hook):
    """NaN/Inf loss guard (reference core/hook/checkloss_hook.py)."""

    def __init__(self, interval: int = 50, **kw):
        self.interval = interval

    def after_train_iter(self, runner, log_vars):
        if runner.iter % self.interval == 0:
            if not np.isfinite(log_vars.get("loss", 0.0)):
                raise FloatingPointError(
                    f"loss became {log_vars['loss']} at iter {runner.iter}")


# reference registers it as CheckInvalidLossHook in some configs
HOOKS.register_module(name="CheckInvalidLossHook", module=CheckLossHook)


@HOOKS.register_module()
class NumClassCheckHook(Hook):
    """Check head num_classes matches dataset CLASSES (reference
    mmdet/datasets/utils.py NumClassCheckHook)."""

    def before_run(self, runner):
        ds = getattr(runner.loader, "dataset", None)
        classes = getattr(ds, "CLASSES", None)
        if classes is None:
            return
        from ...engine.runner import _num_classes
        nc = _num_classes(runner.cfg)
        if nc != len(classes):
            runner.logger.warning(
                f"model num_classes={nc} != len(dataset.CLASSES)="
                f"{len(classes)}")


@HOOKS.register_module()
class EMAHook(Hook):
    """Exponential moving average of params (reference core/hook/ema.py)."""

    def __init__(self, momentum: float = 0.0002, interval: int = 1, **kw):
        self.momentum = momentum
        self.interval = interval
        self.ema_params = None

    def after_train_iter(self, runner, log_vars):
        if runner.iter % self.interval:
            return
        if self.ema_params is None:
            self.ema_params = jax.tree_util.tree_map(lambda x: x,
                                                     runner.params)
            return
        m = self.momentum
        self.ema_params = jax.tree_util.tree_map(
            lambda e, p: (1 - m) * e + m * p, self.ema_params, runner.params)

    def swap(self, runner):
        if self.ema_params is not None:
            runner.params, self.ema_params = self.ema_params, runner.params


@HOOKS.register_module()
class SetEpochInfoHook(Hook):
    def before_train_epoch(self, runner):
        pass  # epoch is runner state; heads read it from the batch if needed


@HOOKS.register_module()
class SyncNormHook(Hook):
    """No-op on TPU: BN stats are frozen and params replicated by jit."""
    def __init__(self, **kw):
        pass


@HOOKS.register_module()
class FeatureHook(Hook):
    """Capture named intermediate activations (reference
    core/hook/feature_hook.py:4). Flax has no forward hooks; instead the
    detector is re-applied with ``capture_intermediates`` on demand."""

    def __init__(self, layer_list: Optional[List[str]] = None, **kw):
        self.layer_list = layer_list or []
        self.features: Dict[str, Any] = {}

    def capture(self, runner, batch):
        variables = {"params": runner.params}
        if runner.batch_stats is not None:
            variables["batch_stats"] = runner.batch_stats
        _, state = runner.det.apply(
            variables, batch, "test",
            capture_intermediates=lambda mdl, name: any(
                key in f"{mdl.name}" for key in self.layer_list),
            mutable=["intermediates"])
        self.features = state.get("intermediates", {})
        return self.features


@HOOKS.register_module()
class WandbLogger(Hook):
    """wandb metrics logging (reference core/hook/wandblogger_hook.py:17).
    Degrades to a no-op warning when wandb is unavailable (it is not baked
    into this image); the log_vars stream still reaches the json log."""

    def __init__(self, init_kwargs=None, interval: int = 50, **kw):
        self.interval = interval
        self.init_kwargs = init_kwargs or {}
        try:
            import wandb
            self.wandb = wandb
        except ImportError:
            self.wandb = None

    def before_run(self, runner):
        if self.wandb:
            self.wandb.init(**self.init_kwargs)
        else:
            runner.logger.warning("wandb not available; WandbLogger is a no-op")

    def after_train_iter(self, runner, log_vars):
        if self.wandb and runner.iter % self.interval == 0:
            self.wandb.log(dict(log_vars), step=runner.iter)

    def after_run(self, runner):
        if self.wandb:
            self.wandb.finish()


@HOOKS.register_module()
class WandbLoggerMulti(WandbLogger):
    """Multi-domain eval variant (reference wandblogger_multi_hook.py)."""
    pass


# mmcv-name compat: configs reference TextLoggerHook inside log_config; the
# runner implements text/json logging natively, so it is a registered no-op.
@HOOKS.register_module()
class TextLoggerHook(Hook):
    def __init__(self, **kw):
        pass


@HOOKS.register_module()
class ProfilerHook(Hook):
    """Capture a device trace for a window of training iterations
    (TPU analog of the reference's profile_time / benchmark utilities,
    mmdet/utils/profiling.py:11 — but a full XLA op trace, not wall-clock
    prints). Works through the axon tunnel; view with tensorboard's profile
    plugin or summarize with tools/analysis_tools/parse_trace.py.

    cfg: dict(type='ProfilerHook', start_iter=10, num_iters=3,
              out_dir='/tmp/jaxprof')
    """

    def __init__(self, start_iter: int = 10, num_iters: int = 3,
                 out_dir: str = "/tmp/jaxprof", **kw):
        self.start_iter = start_iter
        self.num_iters = num_iters
        self.out_dir = out_dir
        self._active = False
        self._done = False

    def after_train_iter(self, runner, log_vars):
        import jax
        it = getattr(runner, "iter", 0)
        if self._done:
            return
        if not self._active and it >= self.start_iter:
            jax.profiler.start_trace(self.out_dir)
            self._active = True
            self._start = it
        elif self._active and it >= self._start + self.num_iters:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
