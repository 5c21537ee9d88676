"""Pallas TPU kernels for OA-Mix geometric warps.

XLA gathers on TPU cost ~8ns per gathered row regardless of contiguity
(~15-17 ms for one 2M-pixel resampling pass), which made the OA-Mix aug
chain gather-bound. The affine ops OA-Mix uses (rotate <= 30deg,
shear <= 0.3, translate) decompose into per-row horizontal shifts
(shear_x/translate_x exactly; shear_y/translate_y via transpose; rotation
via the Paeth 3-shear factorization
R(t) = Shx(-tan(t/2)) . Shy(sin t) . Shx(-tan(t/2))), and a per-row shift
is a contiguous DMA, not a gather.

``shear_rows`` is that kernel (measured 3.6 ms vs ~31 ms for the XLA
2-gather pass at 1024x2048x4): the (W, C) plane is flattened so each row's
shifted window is one contiguous slice; DMA starts are 128-aligned with the
sub-tile residual handled by an in-VMEM dynamic roll; per-row DMAs are
issued in a wave then awaited (double buffering across the row-block grid).

CPU/tests use the pure-XLA fallback (``interpret=True`` routes there).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_PROGRAM = 8


def _shear_kernel(start_ref, resid_ref, frac_ref, img_ref, out_ref, scratch,
                  sems, *, c: int, n_rows: int):
    rows = out_ref.shape[0]
    wc = out_ref.shape[2]
    s_len = scratch.shape[2]
    r0 = pl.program_id(0) * rows

    for i in range(rows):
        @pl.when(r0 + i < n_rows)
        def _(i=i):
            st = pl.multiple_of(start_ref[r0 + i], 128)
            pltpu.make_async_copy(img_ref.at[r0 + i, :, pl.ds(st, s_len)],
                                  scratch.at[i], sems.at[i]).start()
    for i in range(rows):
        @pl.when(r0 + i < n_rows)
        def _(i=i):
            st = pl.multiple_of(start_ref[r0 + i], 128)
            pltpu.make_async_copy(img_ref.at[r0 + i, :, pl.ds(st, s_len)],
                                  scratch.at[i], sems.at[i]).wait()
    for i in range(rows):
        f = frac_ref[r0 + i]
        r = resid_ref[r0 + i]
        si = scratch[i]                                     # (1, S)
        a = pltpu.roll(si, shift=s_len - r, axis=1)
        b = pltpu.roll(si, shift=s_len - r - c, axis=1)
        out_ref[i, :, :] = a[:, :wc] * (1.0 - f) + b[:, :wc] * f


GROUP_ROWS = 8          # one vreg of sublanes
# Per-group FLAT shift-span bound: the floored per-row shift varies by
# up to ceil(slope*7) = 4 px across an 8-row group (slope <= sin 30deg),
# x C flat lanes = 16 at C=4 — EXACTLY the old bound of 16, which the
# clip then corrupted by one lane (caught by the merged-chain parity
# bisect: rotate pass 2 off by one lane-row). 32 costs one extra
# binary-roll stage and is safe for every OA-Mix op up to C=4.
MAX_RESID = 32


def _resid_roll(t, resid, s_len, max_resid=MAX_RESID):
    """Apply a per-row left-shift of resid[r] in [0, MAX_RESID) to an
    (8, S) tile via binary decomposition: log2(MAX_RESID) stages of one
    uniform roll + one per-row select each (rolls compose additively per
    row), instead of MAX_RESID materialized candidates. 4 rolls + 4
    selects vs 32 rolls + 32 selects."""
    d = 1
    while d < max_resid:
        rolled = pltpu.roll(t, shift=s_len - d, axis=1)
        t = jnp.where((resid & d) != 0, rolled, t)
        d *= 2
    return t


def _shear_kernel_v3(base_ref, img_ref, resid_ref, frac_ref, out_ref, *,
                     c: int, wc: int):
    """(8, S)-tile formulation: rows sit on sublanes (native vreg layout),
    ONE dynamic lane-rotation by the group's base shift, then the per-row
    residual (< MAX_RESID by construction: shifts vary by at most slope*c
    per row) is resolved with binary-decomposed rolls + per-row selects —
    every op is a full-width vector op, no per-row scalar loops."""
    i = pl.program_id(0)
    s_len = img_ref.shape[1]
    # bf16 lanes: load in the caller's dtype (half the HBM traffic for
    # the OA-Mix chain) and upcast in VMEM — identical f32 math
    tile = img_ref[:, :].astype(jnp.float32)
    t0 = pltpu.roll(tile, shift=s_len - base_ref[i], axis=1)
    resid = resid_ref[:, :]                          # (8, 1) int32
    frac = frac_ref[:, :]                            # (8, 1) f32
    t = _resid_roll(t0, resid, s_len)
    a = t[:, :wc]
    b = pltpu.roll(t, shift=s_len - c, axis=1)[:, :wc]
    out_ref[:, :] = (a * (1.0 - frac) + b * frac).astype(out_ref.dtype)


def _shear_kernel_v4(rollb_ref, img_ref, fs_ref, resid_ref, frac_ref,
                     out_ref, *, c: int, wc: int):
    """Pad-free variant: reads the UNPADDED (8, W*C) rows and realigns
    with CYCLIC rolls; out-of-range taps (including every wrapped lane)
    are zeroed by an index mask instead of a padded border. Kills the
    (H, s_len) padded copy the v3 wrapper materialized in HBM — at
    1024x2048x4 f32 that copy alone was ~56 MB of traffic per pass.
    Requires W*C % 128 == 0 (the wrapper falls back to v3 otherwise)."""
    i = pl.program_id(0)
    tile = img_ref[:, :].astype(jnp.float32)     # bf16 lanes: upcast in VMEM
    t0 = pltpu.roll(tile, shift=rollb_ref[i], axis=1)
    t = _resid_roll(t0, resid_ref[:, :], wc, MAX_RESID)
    li = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    src = li + fs_ref[:, :]                            # (8, WC)
    f = frac_ref[:, :]
    a = jnp.where((src >= 0) & (src < wc), t, 0).astype(jnp.float32)
    b_t = pltpu.roll(t, shift=wc - c, axis=1)
    b = jnp.where((src + c >= 0) & (src + c < wc), b_t, 0) \
        .astype(jnp.float32)
    out_ref[:, :] = (a * (1.0 - f) + b * f).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shear_rows_v4(img: jnp.ndarray, shifts: jnp.ndarray, fracs: jnp.ndarray,
                  max_shift: int, interpret: bool = False) -> jnp.ndarray:
    """Same contract as shear_rows via the pad-free cyclic-roll kernel.
    Caller guarantees W*C % 128 == 0 (lane-aligned rows)."""
    h, w, c = img.shape
    wc = w * c
    fs = (jnp.clip(shifts, -max_shift, max_shift).astype(jnp.int32)
          * c)                                          # flat, may be < 0
    hb = pl.cdiv(h, GROUP_ROWS)
    grp = fs.reshape(hb, GROUP_ROWS)
    base = jnp.min(grp, axis=1)                         # (HB,)
    resid = jnp.clip(grp - base[:, None], 0,
                     MAX_RESID - 1).reshape(h, 1).astype(jnp.int32)
    roll_base = ((wc - base) % wc).astype(jnp.int32)
    kernel = functools.partial(_shear_kernel_v4, c=c, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(hb,),
            in_specs=[pl.BlockSpec((GROUP_ROWS, wc), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GROUP_ROWS, wc), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((h, wc), img.dtype),
    )(roll_base, img.reshape(h, wc), fs.reshape(h, 1),
      resid, fracs.astype(jnp.float32).reshape(h, 1))
    return out.reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shear_rows_v3(img: jnp.ndarray, shifts: jnp.ndarray, fracs: jnp.ndarray,
                  max_shift: int, interpret: bool = False) -> jnp.ndarray:
    """Same contract as shear_rows; sublane-parallel kernel (see above).
    Requires the per-row shift to vary by < MAX_RESID within any 8 rows —
    true for every OA-Mix warp (|slope| <= sin(30deg), c = 3).
    Lane-aligned rows (W*C % 128 == 0 — every production resolution)
    route to the pad-free v4 kernel."""
    if interpret or jax.devices()[0].platform == "cpu":
        return shear_rows_xla(img, shifts, fracs, max_shift)
    if (img.shape[1] * img.shape[2]) % 128 == 0:
        return shear_rows_v4(img, shifts, fracs, max_shift)
    h, w, c = img.shape
    pad = max_shift + 8
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0))).reshape(h, -1)
    wc = w * c
    s_len = ((img_p.shape[1] + 127) // 128) * 128
    img_p = jnp.pad(img_p, ((0, 0), (0, s_len - img_p.shape[1])))
    flat_start = jnp.clip((shifts + pad) * c, 0,
                          s_len - wc - c - MAX_RESID).astype(jnp.int32)
    hb = pl.cdiv(h, GROUP_ROWS)
    group = flat_start.reshape(hb, GROUP_ROWS)
    base = jnp.min(group, axis=1)                    # (HB,)
    resid = jnp.clip(group - base[:, None], 0,
                     MAX_RESID - 1).reshape(h, 1).astype(jnp.int32)
    kernel = functools.partial(_shear_kernel_v3, c=c, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(hb,),
            in_specs=[pl.BlockSpec((GROUP_ROWS, s_len),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GROUP_ROWS, wc), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((h, wc), img.dtype),
    )(base, img_p, resid, fracs.astype(jnp.float32).reshape(h, 1))
    return out.reshape(h, w, c)


BLOCK_ROWS = 64


def _shear_kernel_block(start_ref, frac_ref, img_ref, out_ref, *,
                        c: int, n_rows: int, wc: int):
    """Row-block variant: the (BLOCK, 1, S) padded rows are auto-pipelined
    into VMEM by the BlockSpec (one large strided fetch per program instead
    of one small DMA per row — the per-descriptor overhead of ~1-2us x H
    rows dominated the original kernel); each row is then realigned with
    two in-VMEM dynamic rolls and lerped."""
    rows = img_ref.shape[0]
    s_len = img_ref.shape[2]
    r0 = pl.program_id(0) * rows
    for i in range(rows):
        @pl.when(r0 + i < n_rows)
        def _(i=i):
            fs = start_ref[r0 + i]
            f = frac_ref[r0 + i]
            si = img_ref[i]                                  # (1, S)
            a = pltpu.roll(si, shift=s_len - fs, axis=1)
            b = pltpu.roll(si, shift=s_len - fs - c, axis=1)
            out_ref[i, :, :] = a[:, :wc] * (1.0 - f) + b[:, :wc] * f


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shear_rows_block(img: jnp.ndarray, shifts: jnp.ndarray,
                     fracs: jnp.ndarray, max_shift: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Same contract as shear_rows, row-block pipelined (see kernel)."""
    if interpret or jax.devices()[0].platform == "cpu":
        return shear_rows_xla(img, shifts, fracs, max_shift)
    h, w, c = img.shape
    pad = max_shift + 8
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0))).reshape(h, 1, -1)
    wc = w * c
    # dynamic_rotate requires a lane-aligned vector: pad rows to 128k
    s_len = ((img_p.shape[2] + 127) // 128) * 128
    img_p = jnp.pad(img_p, ((0, 0), (0, 0),
                            (0, s_len - img_p.shape[2])))
    flat_start = jnp.clip((shifts + pad) * c, 0,
                          s_len - wc - c).astype(jnp.int32)
    hb = pl.cdiv(h, BLOCK_ROWS)
    kernel = functools.partial(_shear_kernel_block, c=c, n_rows=h, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(hb,),
            in_specs=[pl.BlockSpec((BLOCK_ROWS, 1, s_len),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 1, wc),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((h, 1, wc), img.dtype),
    )(flat_start, fracs.astype(jnp.float32), img_p)
    return out.reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def shear_rows(img: jnp.ndarray, shifts: jnp.ndarray, fracs: jnp.ndarray,
               max_shift: int, interpret: bool = False) -> jnp.ndarray:
    """Per-row horizontal shift with linear interpolation, zero border.

    out[y, x] = (1-f[y]) * img[y, x + s[y]] + f[y] * img[y, x + s[y] + 1]
    with reads outside [0, W) giving 0. ``shifts`` int32 (H,) in
    [-max_shift, max_shift]; ``fracs`` f32 (H,) in [0, 1).
    """
    if interpret or jax.devices()[0].platform == "cpu":
        return shear_rows_xla(img, shifts, fracs, max_shift)
    h, w, c = img.shape
    pad = max_shift + 160          # window slack: alignment + roll margin
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0))).reshape(h, 1, -1)
    wc = w * c
    s_len = ((wc + c + 127) // 128 + 2) * 128
    flat_start = jnp.clip((shifts + pad) * c, 0,
                          img_p.shape[2] - s_len).astype(jnp.int32)
    start = (flat_start // 128) * 128
    resid = flat_start - start

    kernel = functools.partial(_shear_kernel, c=c, n_rows=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(pl.cdiv(h, ROWS_PER_PROGRAM),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((ROWS_PER_PROGRAM, 1, wc),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ROWS_PER_PROGRAM, 1, s_len), img.dtype),
                pltpu.SemaphoreType.DMA((ROWS_PER_PROGRAM,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h, 1, wc), img.dtype),
    )(start, resid, fracs.astype(jnp.float32), img_p)
    return out.reshape(h, w, c)


def shear_rows_xla(img, shifts, fracs, max_shift: int):
    """Pure-XLA reference/fallback (take_along_axis, gather-bound).
    Always computes in f32 so CPU/interpret results are independent of the
    caller's lane dtype (the TPU kernels take bf16 lanes)."""
    img = img.astype(jnp.float32)
    h, w, c = img.shape
    pad = max_shift + 1
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)))
    base = jnp.clip(shifts + pad, 0, img_p.shape[1] - (w + 1))
    idx = base[:, None] + jnp.arange(w)[None, :]
    a = jnp.take_along_axis(img_p, idx[..., None], axis=1)
    b = jnp.take_along_axis(img_p, (idx + 1)[..., None], axis=1)
    f = fracs[:, None, None]
    return a * (1.0 - f) + b * f


# ------------------------------------------------------------------ ops ----

def _row_shift_params(k1, k2, n_rows: int, max_shift: int):
    """Continuous per-row offset o(y) = k1*y + k2, split into int + frac."""
    y = jnp.arange(n_rows, dtype=jnp.float32)
    off = jnp.clip(k1 * y + k2, -max_shift, max_shift)
    s = jnp.floor(off)
    return s.astype(jnp.int32), off - s


def warp_shear_x(img, s, cx, cy, max_shift: int, interpret: bool = False):
    """cv2-form shear_x (augmix.py:115): inverse sx = x + s*(y - cy)."""
    shifts, fracs = _row_shift_params(s, -s * cy, img.shape[0], max_shift)
    return shear_rows_v3(img, shifts, fracs, max_shift, interpret=interpret)


def warp_shear_y(img, s, cx, cy, max_shift: int, interpret: bool = False):
    t = jnp.transpose(img, (1, 0, 2))
    shifts, fracs = _row_shift_params(s, -s * cx, t.shape[0], max_shift)
    t = shear_rows_v3(t, shifts, fracs, max_shift, interpret=interpret)
    return jnp.transpose(t, (1, 0, 2))


def warp_translate_x(img, tx, max_shift: int, interpret: bool = False):
    shifts, fracs = _row_shift_params(0.0, tx, img.shape[0], max_shift)
    return shear_rows_v3(img, shifts, fracs, max_shift, interpret=interpret)


def warp_translate_y(img, ty, max_shift: int, interpret: bool = False):
    t = jnp.transpose(img, (1, 0, 2))
    shifts, fracs = _row_shift_params(0.0, ty, t.shape[0], max_shift)
    t = shear_rows_v3(t, shifts, fracs, max_shift, interpret=interpret)
    return jnp.transpose(t, (1, 0, 2))


def warp_translate(img, tx, ty, max_shift: int, interpret: bool = False):
    out = warp_translate_x(img, tx, max_shift, interpret=interpret)
    return warp_translate_y(out, ty, max_shift, interpret=interpret)


def warp_rotate(img, rad, cx, cy, max_shift_x: int, max_shift_y: int,
                interpret: bool = False):
    """3-shear rotation about (cx, cy) (Paeth): three 1D resampling passes.
    For |rad| <= 30deg the shears are tan(rad/2) <= 0.27, sin(rad) <= 0.5."""
    a = -jnp.tan(rad / 2.0)
    b = jnp.sin(rad)
    h, w = img.shape[0], img.shape[1]
    s1, f1 = _row_shift_params(a, -a * cy, h, max_shift_x)
    out = shear_rows_v3(img, s1, f1, max_shift_x, interpret=interpret)
    t = jnp.transpose(out, (1, 0, 2))
    s2, f2 = _row_shift_params(b, -b * cx, w, max_shift_y)
    t = shear_rows_v3(t, s2, f2, max_shift_y, interpret=interpret)
    out = jnp.transpose(t, (1, 0, 2))
    s3, f3 = _row_shift_params(a, -a * cy, h, max_shift_x)
    return shear_rows_v3(out, s3, f3, max_shift_x, interpret=interpret)


# ------------------------------------------------- piecewise (per-box) ----

PW_MAX_RESID = 32       # see MAX_RESID: 16 was hit exactly at C=4


def _pw_shift_kernel(base_ref, pres_ref, img_ref, bid_ref, resid_ref,
                     frac_ref, out_ref, *, c: int, wc: int, g: int,
                     pad_flat: int):
    """Per-box piecewise row-shift: each pixel is shifted by its box's
    per-row offset. Rows on sublanes; per present box: one dynamic
    lane-rotation to the box's block-base window + residual static rolls;
    a per-pixel box-id select merges the boxes. Boxes absent from the
    8-row block are skipped entirely (pl.when on the prefetch presence
    mask), so per-block work tracks the ~1-3 locally relevant boxes, not
    MAX_FG."""
    i = pl.program_id(0)
    s_len = img_ref.shape[1]
    tile = img_ref[:, :].astype(jnp.float32)     # bf16 lanes: upcast in VMEM
    # identity (zero-shift) default — pixels of skipped boxes keep it
    out_ref[:, :] = pltpu.roll(tile, shift=s_len - pad_flat,
                               axis=1)[:, :wc].astype(out_ref.dtype)
    bid = bid_ref[:, :]
    for gi in range(g):
        @pl.when(pres_ref[i, gi] > 0)
        def _(gi=gi):
            t_g = pltpu.roll(tile, shift=s_len - base_ref[i, gi], axis=1)
            resid = resid_ref[:, gi:gi + 1]
            frac = frac_ref[:, gi:gi + 1]
            t = _resid_roll(t_g, resid, s_len, PW_MAX_RESID)
            a = t[:, :wc]
            b = pltpu.roll(t, shift=s_len - c, axis=1)[:, :wc]
            val = (a * (1.0 - frac) + b * frac).astype(out_ref.dtype)
            out_ref[:, :] = jnp.where(bid == gi, val, out_ref[:, :])


def _pw_shift_kernel_v4(rollb_ref, pres_ref, img_ref, bid_ref, fs_ref,
                        resid_ref, frac_ref, out_ref, *, c: int, wc: int,
                        g: int):
    """Pad-free piecewise row-shift (see _shear_kernel_v4): unpadded
    rows, cyclic rolls, index-mask borders. The zero-shift identity
    default is the tile itself (no roll at all)."""
    i = pl.program_id(0)
    tile = img_ref[:, :].astype(jnp.float32)     # bf16 lanes: upcast in VMEM
    out_ref[:, :] = tile.astype(out_ref.dtype)
    bid = bid_ref[:, :]
    li = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    for gi in range(g):
        @pl.when(pres_ref[i, gi] > 0)
        def _(gi=gi):
            t_g = pltpu.roll(tile, shift=rollb_ref[i, gi], axis=1)
            t = _resid_roll(t_g, resid_ref[:, gi:gi + 1], wc, PW_MAX_RESID)
            src = li + fs_ref[:, gi:gi + 1]
            frac = frac_ref[:, gi:gi + 1]
            a = jnp.where((src >= 0) & (src < wc), t,
                          0).astype(jnp.float32)
            b_t = pltpu.roll(t, shift=wc - c, axis=1)
            b = jnp.where((src + c >= 0) & (src + c < wc), b_t,
                          0).astype(jnp.float32)
            val = (a * (1.0 - frac) + b * frac).astype(out_ref.dtype)
            out_ref[:, :] = jnp.where(bid == gi, val, out_ref[:, :])


def pw_prep(bid: jnp.ndarray, g: int, c: int):
    """Precompute the per-view constants of piecewise_shift_rows for a
    fixed box-id map: channel-flattened bid and the per-8-row-block box
    presence mask. Hoisting this out of the per-aug-call path amortizes it
    across the ~8 geo calls x 3 passes of a train step."""
    h, w = bid.shape
    hb = pl.cdiv(h, GROUP_ROWS)
    bid_blocks = bid.reshape(hb, GROUP_ROWS * w)
    # presence = does box gi appear anywhere in the 8-row block? An
    # equality-compare + any-reduce; the earlier vmapped scatter-add
    # formulation lowered to ~36 ms of serialized XLA scatter per call.
    ids = jnp.arange(g, dtype=bid_blocks.dtype)
    pres = (bid_blocks[:, :, None] == ids[None, None, :]).any(axis=1)
    pres = pres.astype(jnp.int32)                      # (HB, G)
    bid_flat = jnp.repeat(bid, c, axis=1).astype(jnp.int32)  # (H, W*C)
    return bid_flat, pres


# ------------------------------------------- merged (per-slot+box) pass ----

def merged_prep(cid: jnp.ndarray, n_slots: int, g: int, c: int):
    """Per-view constants for ``merged_shift_rows``: channel-flattened
    composite-id map plus the per-8-row-block presence masks of boxes
    (cid % g) and slots (cid // g). cid (H, W) int32 = slot_id * g + best_id.
    """
    h, w = cid.shape
    hb = pl.cdiv(h, GROUP_ROWS)
    blocks = cid.reshape(hb, GROUP_ROWS * w)
    valid = blocks < n_slots * g            # identity sentinel = S*G
    bids = jnp.where(valid, blocks % g, g)
    sids = jnp.where(valid, blocks // g, n_slots)
    box_ids = jnp.arange(g, dtype=blocks.dtype)
    slot_ids = jnp.arange(n_slots, dtype=blocks.dtype)
    pres_box = (bids[:, :, None] == box_ids[None, None, :]).any(axis=1) \
        .astype(jnp.int32)                                # (HB, G)
    pres_slot = (sids[:, :, None] == slot_ids[None, None, :]).any(axis=1) \
        .astype(jnp.int32)                                # (HB, S)
    cid_flat = jnp.repeat(cid, c, axis=1).astype(jnp.int32)     # (H, W*C)
    return cid_flat, pres_box, pres_slot


def _merged_shift_kernel(rollb_sl_ref, rollb_bb_ref, pres_slot_ref,
                         pres_box_ref, isbg_ref, isbb_ref, img_ref, cid_ref,
                         fs_sl_ref, resid_sl_ref, frac_sl_ref, fs_bb_ref,
                         resid_bb_ref, frac_bb_ref, out_ref, *, c: int,
                         wc: int, n_slots: int, g: int):
    """ONE kernel pass for every geometric op a merged OA-Mix depth step
    drew, replacing per-slot conditional warp dispatch:

    - default: identity (pixels of photometric/inactive slots);
    - per-slot bg_only shifts (loop over S slots, runtime-gated by the
      depth step's is_bg draw flags AND the slot's static block presence);
    - per-(slot, box) bboxes_only shifts (loop over S*G composite ids,
      gated by is_bb[slot] and the box's static block presence — the
      executed work per block tracks the handful of locally present
      (drawn-slot, box) pairs, not the 48-entry table).

    Pad-free cyclic-roll realignment + index-mask borders as in
    _pw_shift_kernel_v4. cid tile holds slot*G+box per lane, so the
    composite select is ONE integer compare.
    """
    i = pl.program_id(0)
    tile = img_ref[:, :].astype(jnp.float32)     # bf16 lanes: upcast in VMEM
    out_ref[:, :] = tile.astype(out_ref.dtype)
    cid = cid_ref[:, :]
    li = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)

    def apply_one(rollb, resid, fs, frac):
        t0 = pltpu.roll(tile, shift=rollb, axis=1)
        t = _resid_roll(t0, resid, wc, PW_MAX_RESID)
        src = li + fs
        a = jnp.where((src >= 0) & (src < wc), t, 0).astype(jnp.float32)
        b_t = pltpu.roll(t, shift=wc - c, axis=1)
        b = jnp.where((src + c >= 0) & (src + c < wc), b_t,
                      0).astype(jnp.float32)
        return (a * (1.0 - frac) + b * frac).astype(out_ref.dtype)

    for si in range(n_slots):
        @pl.when((isbg_ref[si] > 0) & (pres_slot_ref[i, si] > 0))
        def _(si=si):
            val = apply_one(rollb_sl_ref[i, si], resid_sl_ref[:, si:si + 1],
                            fs_sl_ref[:, si:si + 1],
                            frac_sl_ref[:, si:si + 1])
            # bg shifts are global: identity-sentinel pixels (cid >=
            # S*G, far from every box) take them too (exact for the
            # per-slot-trio caller, n_slots == 1)
            sel = ((cid >= si * g) & (cid < (si + 1) * g)) | \
                (cid >= n_slots * g)
            out_ref[:, :] = jnp.where(sel, val, out_ref[:, :])

    for k in range(n_slots * g):
        si, gi = k // g, k % g
        @pl.when((isbb_ref[si] > 0) & (pres_box_ref[i, gi] > 0))
        def _(k=k):
            val = apply_one(rollb_bb_ref[i, k], resid_bb_ref[:, k:k + 1],
                            fs_bb_ref[:, k:k + 1],
                            frac_bb_ref[:, k:k + 1])
            out_ref[:, :] = jnp.where(cid == k, val, out_ref[:, :])


def _fs_tables(p, h, hb, c):
    """Continuous shifts (H, K) -> flat int shifts + per-block roll bases
    + residuals + fracs for the cyclic-roll kernels."""
    s_int = jnp.floor(p)
    fracs = (p - s_int).astype(jnp.float32)
    fs = s_int.astype(jnp.int32) * c
    k = p.shape[1]
    grp = fs.reshape(hb, GROUP_ROWS, k)
    base = jnp.min(grp, axis=1)                          # (HB, K)
    resid = jnp.clip(grp - base[:, None, :], 0,
                     PW_MAX_RESID - 1).reshape(h, k).astype(jnp.int32)
    return fs, base, resid, fracs


def merged_shift_rows(img: jnp.ndarray, cid: jnp.ndarray, p_bb: jnp.ndarray,
                      p_sl: jnp.ndarray, is_bb: jnp.ndarray,
                      is_bg: jnp.ndarray, prep=None) -> jnp.ndarray:
    """Merged per-row shift: each pixel shifts by its composite id's
    offset — p_bb[y, cid] where the pixel's slot drew a bboxes_only op,
    p_sl[y, slot] where it drew a bg_only op, identity otherwise.

    img (H, W, C); cid (H, W) int32 in [0, S*G) = slot*G + box;
    p_bb (H, S*G) float continuous shifts (pre-clipped by the caller to
    each family's legacy bounds); p_sl (H, S); is_bb/is_bg (S,) bool/int
    per-slot draw flags. ``prep`` = merged_prep(cid, S, G, C).
    """
    h, w, c = img.shape
    sg = p_bb.shape[1]
    s = p_sl.shape[1]
    g = sg // s
    if jax.devices()[0].platform == "cpu":
        # per-pixel gather fallback (CPU tests): identical lerp math,
        # pinned to f32 independent of the caller's lane dtype
        img = img.astype(jnp.float32)
        valid = cid < s * g                  # identity sentinel = S*G
        slot = jnp.minimum(cid // g, s - 1)  # sentinel -> slot 0 (bg is
        # global and the caller runs per-slot trios, n_slots == 1)
        s_px = jnp.take_along_axis(p_bb, jnp.minimum(cid, sg - 1), axis=1)
        s_sl = jnp.take_along_axis(p_sl, slot, axis=1)
        bbm = is_bb.astype(bool)[slot] & valid
        bgm = is_bg.astype(bool)[slot]
        p_px = jnp.where(bbm, s_px, jnp.where(bgm, s_sl, 0.0))
        si = jnp.floor(p_px)
        f = (p_px - si)[..., None]
        idx = jnp.arange(w)[None, :] + si.astype(jnp.int32)

        def tap(ix):
            v = jnp.take_along_axis(img, jnp.clip(ix, 0, w - 1)[..., None],
                                    axis=1)
            return jnp.where(((ix >= 0) & (ix < w))[..., None], v, 0.0)

        return tap(idx) * (1.0 - f) + tap(idx + 1) * f
    wc = w * c
    assert wc % 128 == 0, "merged_shift_rows needs lane-aligned rows"
    hb = pl.cdiv(h, GROUP_ROWS)
    cid_flat, pres_box, pres_slot = (prep if prep is not None
                                     else merged_prep(cid, s, g, c))
    fs_bb, base_bb, resid_bb, frac_bb = _fs_tables(p_bb, h, hb, c)
    fs_sl, base_sl, resid_sl, frac_sl = _fs_tables(p_sl, h, hb, c)
    rollb_bb = ((wc - base_bb) % wc).astype(jnp.int32)
    rollb_sl = ((wc - base_sl) % wc).astype(jnp.int32)
    kernel = functools.partial(_merged_shift_kernel, c=c, wc=wc,
                               n_slots=s, g=g)
    row_spec = lambda i, *_: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(hb,),
            in_specs=[pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, s), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, s), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, s), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, sg), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, sg), row_spec,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, sg), row_spec,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((h, wc), img.dtype),
    )(rollb_sl, rollb_bb, pres_slot, pres_box,
      is_bg.astype(jnp.int32), is_bb.astype(jnp.int32),
      img.reshape(h, wc), cid_flat, fs_sl, resid_sl, frac_sl,
      fs_bb, resid_bb, frac_bb)
    return out.reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def piecewise_shift_rows(img: jnp.ndarray, bid: jnp.ndarray,
                         shifts: jnp.ndarray, max_shift: int,
                         interpret: bool = False, prep=None) -> jnp.ndarray:
    """out[y, x] = lerp(img[y, x + shifts[y, bid[y, x]]]) — per-row,
    per-box horizontal shift with linear interpolation, zero border.

    img (H, W, C); bid (H, W) int32 in [0, G); shifts (H, G) float
    (clipped to ±max_shift). The per-box shift must vary by < PW_MAX_RESID
    flat elements across any 8 consecutive rows (slope*c bound — true for
    OA-Mix's |slope| <= sin(30deg), c = 3). ``prep`` takes the
    pw_prep(bid, ...) result to skip recomputing the bid-derived maps.
    """
    h, w, c = img.shape
    g = shifts.shape[1]
    shifts = jnp.clip(shifts, -max_shift, max_shift)
    if interpret or jax.devices()[0].platform == "cpu":
        s_all = jnp.floor(shifts)
        f_all = (shifts - s_all)
        outs = []
        for gi in range(g):
            outs.append(shear_rows_xla(img, s_all[:, gi].astype(jnp.int32),
                                       f_all[:, gi], max_shift))
        stack = jnp.stack(outs)                        # (G, H, W, C)
        out = jnp.take_along_axis(
            stack, jnp.minimum(bid, g - 1)[None, :, :, None].repeat(c, -1),
            axis=0)[0]
        # identity-sentinel ids (bid == G, pixels far from every box —
        # see pallas_fg.BID_EPS) keep the source pixel
        return jnp.where((bid < g)[..., None], out, img)
    wc = w * c
    s_int = jnp.floor(shifts)
    fracs = (shifts - s_int).astype(jnp.float32)       # (H, G)
    hb = pl.cdiv(h, GROUP_ROWS)
    bid_flat, pres = prep if prep is not None else pw_prep(bid, g, c)
    if wc % 128 == 0:
        # pad-free cyclic-roll path (every production resolution)
        fs = s_int.astype(jnp.int32) * c               # (H, G), may be < 0
        grp = fs.reshape(hb, GROUP_ROWS, g)
        base = jnp.min(grp, axis=1)                    # (HB, G)
        resid = jnp.clip(grp - base[:, None, :], 0,
                         PW_MAX_RESID - 1).reshape(h, g).astype(jnp.int32)
        roll_base = ((wc - base) % wc).astype(jnp.int32)
        kernel = functools.partial(_pw_shift_kernel_v4, c=c, wc=wc, g=g)
        row_spec = lambda i, *_: (i, 0)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(hb,),
                in_specs=[pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((GROUP_ROWS, g), row_spec,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((GROUP_ROWS, g), row_spec,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((GROUP_ROWS, g), row_spec,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((GROUP_ROWS, wc), row_spec,
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((h, wc), img.dtype),
        )(roll_base, pres, img.reshape(h, wc), bid_flat, fs, resid,
          fracs)
        return out.reshape(h, w, c)
    pad = max_shift + 8
    img_p = jnp.pad(img, ((0, 0), (pad, pad), (0, 0))).reshape(h, -1)
    s_len = ((img_p.shape[1] + 127) // 128) * 128
    img_p = jnp.pad(img_p, ((0, 0), (0, s_len - img_p.shape[1])))
    flat_start = jnp.clip((s_int.astype(jnp.int32) + pad) * c, 0,
                          s_len - wc - c - PW_MAX_RESID)
    grp = flat_start.reshape(hb, GROUP_ROWS, g)
    base = jnp.min(grp, axis=1)                        # (HB, G)
    resid = jnp.clip(grp - base[:, None, :], 0,
                     PW_MAX_RESID - 1).reshape(h, g).astype(jnp.int32)
    kernel = functools.partial(_pw_shift_kernel, c=c, wc=wc, g=g,
                               pad_flat=pad * c)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(hb,),
            in_specs=[pl.BlockSpec((GROUP_ROWS, s_len),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, wc), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, g), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GROUP_ROWS, g), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((GROUP_ROWS, wc), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((h, wc), img.dtype),
    )(base, pres, img_p, bid_flat, resid, fracs)
    return out.reshape(h, w, c)
