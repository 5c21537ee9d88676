"""Micro-bench for the on-device OA-Mix batch kernel in isolation.

Times ``oamix_batch`` (the augmentation block of the flagship train step —
reference workload mmdet/datasets/pipelines/oa_mix.py:207-236) on the real
chip, outside the train step, so per-op and per-knob costs can be measured
without recompiling the whole model.

Usage:
    python tools/misc/bench_oamix.py                 # production path
    OAMIX_FORCE_OP=5 python tools/misc/bench_oamix.py  # every draw = op 5
    OAMIX_SKIP_CHAIN=1 python tools/misc/bench_oamix.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--gts", type=int, default=8)
    args = ap.parse_args()

    from oadg_tpu.ops.oamix_device import oamix_batch

    cfg = dict(version="augmix", num_views=2, severity=10,
               mixture_width=3, mixture_depth=-1)

    b, h, w = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (b, h, w, 3)).astype(np.float32))
    g = args.gts
    x1 = rng.uniform(0, w - 200, (b, g)).astype(np.float32)
    y1 = rng.uniform(0, h - 200, (b, g)).astype(np.float32)
    bw = rng.uniform(30, 200, (b, g)).astype(np.float32)
    bh = rng.uniform(30, 200, (b, g)).astype(np.float32)
    gt = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], -1))
    gtv = jnp.ones((b, g), bool)
    shape = jnp.asarray(np.tile([[h, w]], (b, 1)).astype(np.float32))

    fn = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.astype(jnp.float32)),
        oamix_batch(img, gt, gtv, shape, k, cfg)))

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = fn(key)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    times = []
    for i in range(args.steps):
        key = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(key))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    knobs = {k: v for k, v in os.environ.items() if k.startswith("OAMIX")}
    print(f"median {med * 1e3:.2f} ms  min {min(times) * 1e3:.2f} ms  "
          f"knobs={knobs}")


if __name__ == "__main__":
    main()
