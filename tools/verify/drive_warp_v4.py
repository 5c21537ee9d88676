"""Drive (session verify): pad-free v4 shear/piecewise kernels on the
REAL TPU vs the XLA reference semantics, across aligned shapes, dtypes,
and shift regimes (incl. extreme shifts that exercise cyclic wrap
masking), plus the auto-routing in shear_rows_v3/piecewise_shift_rows.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from oadg_tpu.ops.pallas_warp import (piecewise_shift_rows, pw_prep,
                                      shear_rows_v3, shear_rows_v4,
                                      shear_rows_xla)

assert jax.devices()[0].platform != "cpu", "run on the TPU"
rng = np.random.RandomState(0)

print("== shear_rows_v4 vs shear_rows_xla ==", flush=True)
for (h, w, c), max_shift, dtype in [
        ((256, 384, 3), 200, jnp.float32),
        ((1024, 2048, 3), 682, jnp.float32),
        ((1024, 2048, 1), 682, jnp.float32),
        ((2048, 1024, 3), 512, jnp.float32),   # transposed-y shape
        # NOTE: bf16 tiles are NOT supported — Mosaic dynamic_rotate is
        # 32-bit only ("Rotate with non-32-bit data", verified 2026-08-20
        # on v5e); the kernels stay f32.
]:
    img = jnp.asarray(rng.randint(0, 256, (h, w, c)).astype(np.float32),
                      dtype)
    shifts = jnp.asarray(
        rng.randint(-max_shift, max_shift + 1, h).astype(np.int32))
    fracs = jnp.asarray(np.sort(rng.rand(h)).astype(np.float32))
    # sort fracs only; shifts must satisfy the group-span bound like
    # production (slope-limited): rebuild as a slope-limited ramp + noise
    y = np.arange(h, dtype=np.float32)
    off = np.clip(0.49 * y - 0.2 * max_shift + rng.rand(h), -max_shift,
                  max_shift)
    shifts = jnp.asarray(np.floor(off).astype(np.int32))
    fracs = jnp.asarray((off - np.floor(off)).astype(np.float32))
    got = np.asarray(shear_rows_v4(img, shifts, fracs, max_shift)
                     .astype(jnp.float32))
    want = np.asarray(shear_rows_xla(img.astype(jnp.float32), shifts,
                                     fracs, max_shift))
    err = np.abs(got - want).max()
    tol = 1.0 if dtype == jnp.bfloat16 else 1e-3
    print(f"  {h}x{w}x{c} {dtype.__name__} ms={max_shift}: max err {err}",
          flush=True)
    assert err <= tol, (h, w, c, dtype, err)

print("== auto-route: shear_rows_v3 == v4 on aligned shapes ==", flush=True)
img = jnp.asarray(rng.randint(0, 256, (512, 1024, 3)).astype(np.float32))
y = np.arange(512, dtype=np.float32)
off = np.clip(0.4 * y - 80, -300, 300)
sh = jnp.asarray(np.floor(off).astype(np.int32))
fr = jnp.asarray((off - np.floor(off)).astype(np.float32))
a = np.asarray(shear_rows_v3(img, sh, fr, 300))
b = np.asarray(shear_rows_v4(img, sh, fr, 300))
assert np.array_equal(a, b), np.abs(a - b).max()
print("  identical", flush=True)

print("== piecewise_shift_rows v4 vs per-box xla ==", flush=True)
for (h, w, c), g, max_shift in [((256, 384, 3), 5, 120),
                                ((1024, 2048, 3), 17, 512),
                                ((1024, 2048, 1), 17, 512)]:
    img = jnp.asarray(rng.randint(0, 256, (h, w, c)).astype(np.float32))
    bid = jnp.asarray(rng.randint(0, g, (h, w)).astype(np.int32))
    y = np.arange(h, dtype=np.float32)[:, None]
    slopes = rng.uniform(-0.49, 0.49, (1, g))
    offs = rng.uniform(-max_shift / 2, max_shift / 2, (1, g))
    shifts = jnp.asarray(np.clip(slopes * y + offs, -max_shift,
                                 max_shift).astype(np.float32))
    prep = pw_prep(bid, g, c)
    got = np.asarray(piecewise_shift_rows(img, bid, shifts, max_shift,
                                          prep=prep))
    s_all = np.floor(np.asarray(shifts))
    f_all = np.asarray(shifts) - s_all
    outs = [np.asarray(shear_rows_xla(img, jnp.asarray(
        s_all[:, gi].astype(np.int32)), jnp.asarray(
        f_all[:, gi].astype(np.float32)), max_shift)) for gi in range(g)]
    want = np.take_along_axis(
        np.stack(outs), np.asarray(bid)[None, :, :, None].repeat(c, -1),
        axis=0)[0]
    err = np.abs(got - want).max()
    print(f"  {h}x{w}x{c} g={g}: max err {err}", flush=True)
    assert err <= 1e-3, err

print("ALL V4 PARITY CHECKS PASSED", flush=True)
