"""profile_time context manager (reference mmdet/utils/profiling.py:11) +
jax.profiler trace helper (SURVEY.md §5.1)."""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Wall-clock timing print (device sync via block_until_ready is the
    caller's concern; XLA dispatch is async)."""
    if not enabled:
        yield
        return
    t0 = time.monotonic()
    try:
        yield
    finally:
        print(f"{trace_name} {name} elapsed_time: {(time.monotonic()-t0)*1000:.2f} ms")


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax_trace"):
    """jax profiler trace scope (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
