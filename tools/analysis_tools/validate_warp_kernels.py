"""On-chip validation of the Pallas warp kernels against the XLA
reference implementations (the CPU test suite only exercises the
fallback path; run this on a real TPU after touching the kernels)."""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from oadg_tpu.ops.pallas_warp import (piecewise_shift_rows, pw_prep,
                                          shear_rows_v3, shear_rows_xla)
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"
    rng = np.random.RandomState(0)
    h, w, c = 256, 512, 3
    img = jnp.asarray(rng.rand(h, w, c).astype(np.float32) * 255)

    # shear_rows_v3: slope-bounded per-row shifts
    for slope, name in ((0.0, "translate"), (0.3, "shear"),
                        (0.5, "rot-pass")):
        base = rng.uniform(-20, 20)
        shifts_f = base + slope * (np.arange(h) - h / 2)
        s_int = jnp.asarray(np.floor(shifts_f).astype(np.int32))
        fr = jnp.asarray((shifts_f - np.floor(shifts_f)).astype(np.float32))
        got = np.asarray(shear_rows_v3(img, s_int, fr, 256))
        want = np.asarray(shear_rows_xla(img, s_int, fr, 256))
        err = np.abs(got - want).max()
        print(f"shear_rows_v3[{name}]: max err {err:.3e}")
        assert err < 1e-3, (name, err)

    # piecewise_shift_rows: per-box shifts on a random box-id map
    g = 16
    bid_np = np.zeros((h, w), np.int32)
    for gi in range(1, g):
        y0, x0 = rng.randint(0, h - 40), rng.randint(0, w - 80)
        bid_np[y0:y0 + 40, x0:x0 + 80] = gi
    bid = jnp.asarray(bid_np)
    shifts = jnp.asarray(
        (rng.uniform(-30, 30, (1, g))
         + rng.uniform(-0.4, 0.4, (g,)) * (np.arange(h)[:, None] - h / 2)
         ).astype(np.float32))
    got = np.asarray(piecewise_shift_rows(img, bid, shifts, 256))
    want = np.asarray(piecewise_shift_rows(img, bid, shifts, 256,
                                           interpret=True))
    err = np.abs(got - want).max()
    print(f"piecewise_shift_rows: max err {err:.3e}")
    assert err < 1e-3, err

    prep = pw_prep(bid, g, c)
    got2 = np.asarray(piecewise_shift_rows(img, bid, shifts, 256, prep=prep))
    err2 = np.abs(got2 - want).max()
    print(f"piecewise_shift_rows(prep): max err {err2:.3e}")
    assert err2 < 1e-3, err2
    print("ALL KERNELS OK")


if __name__ == "__main__":
    main()
