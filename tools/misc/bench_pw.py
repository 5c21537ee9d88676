"""Micro-bench for the piecewise-shift Pallas warp kernel in isolation.

The OA-Mix chain's geometric ops are ~60% of its measured cost
(OAMIX_FORCE_OP sweep, 2026-08-20: bb shear 0.80 ms/exec vs 0.09 ms
switch overhead), and each exec is 1-6 kernel passes. This bench times
the pass at production shape under dtype knobs.

Timing notes for this tunneled TPU: small dispatches look async and a
sync costs ~25 ms, so the op is looped K times inside ONE jit with a
data dependency and the cost is the slope between two loop depths.

Usage: python tools/misc/bench_pw.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope_bench(make_fn, x, k1=2, k2=18, steps=8):
    """Per-exec ms via the (k2 - k1) slope of chained executions."""
    def run(k):
        f = jax.jit(make_fn(k))
        jax.block_until_ready(f(x))
        ts = []
        for _ in range(steps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3
    t1, t2 = run(k1), run(k2)
    return (t2 - t1) / (k2 - k1), t1, t2


def main():
    from oadg_tpu.ops.pallas_warp import piecewise_shift_rows, pw_prep

    h, w, g = 1024, 2048, 16
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w]

    def voronoi_bid(n_boxes):
        cy = rng.uniform(0, h, n_boxes)
        cx = rng.uniform(0, w, n_boxes)
        d = (yy[None] - cy[:, None, None]) ** 2 + \
            (xx[None] - cx[:, None, None]) ** 2
        return np.argmin(d, axis=0).astype(np.int32)

    def sentinel_bid(n_boxes, ext=140):
        """Post-BID_EPS map: box ids only near their boxes, else G."""
        bid = np.full((h, w), g, np.int32)
        for i in range(n_boxes):
            y0 = int(rng.uniform(0, h - 200))
            x0 = int(rng.uniform(0, w - 200))
            bid[y0:y0 + ext, x0:x0 + ext] = i
        return bid

    shifts = jnp.asarray(rng.uniform(-80, 80, (h, g)).astype(np.float32))
    for tag, bid_np in (("voronoi(8)", voronoi_bid(8)),
                        ("sentinel(8)", sentinel_bid(8))):
        bid = jnp.asarray(bid_np)
        for c in (3, 4):
            img = jnp.asarray(
                rng.randint(0, 256, (h, w, c)).astype(np.float32))
            prep = jax.jit(lambda b: pw_prep(b, g, c))(bid)

            def mk(k):
                def f(x):
                    def body(carry, _):
                        out = piecewise_shift_rows(carry, bid, shifts, 512,
                                                   prep=prep)
                        return out, None
                    out, _ = jax.lax.scan(body, x, None, length=k)
                    return out
                return f

            per, t1, t2 = slope_bench(mk, img)
            print(f"pw {tag} c={c} f32: {per:.3f} ms/pass   "
                  f"(t[2]={t1:.1f} t[18]={t2:.1f})", flush=True)


if __name__ == "__main__":
    main()
