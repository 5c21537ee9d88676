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
MAX_RESID = 16          # per-group shift span bound (slope*c <= 1.5, 8 rows)


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
    tile = img_ref[:, :]
    t0 = pltpu.roll(tile, shift=s_len - base_ref[i], axis=1)
    resid = resid_ref[:, :]                          # (8, 1) int32
    frac = frac_ref[:, :]                            # (8, 1) f32
    t = _resid_roll(t0, resid, s_len)
    a = t[:, :wc]
    b = pltpu.roll(t, shift=s_len - c, axis=1)[:, :wc]
    out_ref[:, :] = a * (1.0 - frac) + b * frac


def _shear_kernel_v4(rollb_ref, img_ref, fs_ref, resid_ref, frac_ref,
                     out_ref, *, c: int, wc: int):
    """Pad-free variant: reads the UNPADDED (8, W*C) rows and realigns
    with CYCLIC rolls; out-of-range taps (including every wrapped lane)
    are zeroed by an index mask instead of a padded border. Kills the
    (H, s_len) padded copy the v3 wrapper materialized in HBM — at
    1024x2048x4 f32 that copy alone was ~56 MB of traffic per pass.
    Requires W*C % 128 == 0 (the wrapper falls back to v3 otherwise)."""
    i = pl.program_id(0)
    tile = img_ref[:, :]
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
    """Pure-XLA reference/fallback (take_along_axis, gather-bound)."""
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

PW_MAX_RESID = 16


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
    tile = img_ref[:, :]
    # identity (zero-shift) default — pixels of skipped boxes keep it
    out_ref[:, :] = pltpu.roll(tile, shift=s_len - pad_flat,
                               axis=1)[:, :wc]
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
            val = a * (1.0 - frac) + b * frac
            out_ref[:, :] = jnp.where(bid == gi, val, out_ref[:, :])


def _pw_shift_kernel_v4(rollb_ref, pres_ref, img_ref, bid_ref, fs_ref,
                        resid_ref, frac_ref, out_ref, *, c: int, wc: int,
                        g: int):
    """Pad-free piecewise row-shift (see _shear_kernel_v4): unpadded
    rows, cyclic rolls, index-mask borders. The zero-shift identity
    default is the tile itself (no roll at all)."""
    i = pl.program_id(0)
    tile = img_ref[:, :]
    out_ref[:, :] = tile
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
        return jnp.take_along_axis(
            stack, bid[None, :, :, None].repeat(c, -1), axis=0)[0]
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
