"""Pallas TPU kernel: RoIAlign backward as per-roi window read-modify-write.

Why a kernel (measured on the flagship bench, TPU v5e, batch 4):
the XLA tap formulation materializes a (R*4*(out*sr)^2, C) update buffer
(1.6 GB bf16, 3 GB at batch 8 — the single largest HBM temp of the whole
train step) and feeds it to a scatter-add that processes rows serially at
the measured 50-65 GB/s scatter floor: ~105 ms/step all-in.

Structure the hardware actually likes: every roi's bilinear splat
factorizes over axes, so its entire gradient contribution is
    G = A @ g @ B^T       (A (S, out), g (out, out, C), B (S, out))
landing in an (S, S) pixel window of its level feature map. The kernel
walks rois on the sequential TPU grid; per roi it computes G on the
MXU/VPU in VMEM and read-modify-writes ONLY that window via strided DMA
(512 KB round trip) — no update buffer, no scatter serialization, HBM
traffic = the true touched-window bytes.

Window size S=32 per axis covers every roi whose per-axis corner span is
<= 31 px at its FPN level — 96.5%+ of proposals (the leftovers are
extreme-aspect boxes; the caller routes them through a bounded XLA tap
pass). Levels smaller than the window fall back to the XLA path
(ops/roi_align.py chooses).

Reference parity: mmdet/mmcv RoIAlign CUDA backward
(mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh) — same math,
per-window instead of per-tap-atomic.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_Y = 32               # window slots, y axis (free offset)
WIN_X = 40               # x axis: offsets must be 8-aligned (sublane
                         # tiling of the (W, C) plane), so the caller
                         # aligns x0 down by up to 7 and the window is
                         # widened to keep the 31-px span covered
# small-window class: ~65% of proposals span <= 15 px per axis at their
# level; DMA-ing them a (16, 24) window instead of (32, 40) cuts the
# kernel's HBM traffic ~2.5x. One kernel handles both classes — the
# per-roi `cls` scalar predicates which DMA extent runs; the slot-weight
# factors of small-class rois are zero outside the small window, so the
# contraction over the full scratch stays exact (stale scratch contents
# beyond the small window are finite and multiply by zero).
WIN_Y_S = 16
WIN_X_S = 24
WIN = WIN_Y              # back-compat alias (span criterion per axis)


def _kernel(num_levels, out, c, table_dtype,
            lvl_ref, bi_ref, y0_ref, x0_ref, ok_ref, cls_ref,
            dy_ref, a_ref, b_ref, *refs):
    """Grid step = one roi. refs = [in_0..in_L-1, out_0..out_L-1,
    win_scratch, sem_in, sem_out] (inputs aliased to outputs)."""
    outs = refs[num_levels:2 * num_levels]
    win = refs[2 * num_levels]
    sem_in = refs[2 * num_levels + 1]
    sem_out = refs[2 * num_levels + 2]

    r = pl.program_id(0)
    lvl = lvl_ref[r]
    bi = bi_ref[r]
    y0 = y0_ref[r]
    x0 = pl.multiple_of(x0_ref[r], 8)
    ok = ok_ref[r]
    cls = cls_ref[r]                               # 0 small, 1 full window

    # G[a, b, c] = sum_oy sum_ox A[a, oy] dy[oy, ox, c] B[b, ox]
    # Two-stage broadcast-FMA (static slices only — Mosaic lowers 3D
    # reshapes/dots to unsupported gathers): ~2.2 MFLOP per roi on the
    # VPU, negligible next to the window DMA.
    A = a_ref[0]                                   # (WIN_Y, out) f32
    Bm = b_ref[0]                                  # (WIN_X, out) f32
    dy = dy_ref[0].astype(jnp.float32)             # (out, out, C)
    t = jnp.zeros((WIN_Y, out, c), jnp.float32)    # t[a, ox, c]
    for oy in range(out):
        t = t + A[:, oy][:, None, None] * dy[oy][None, :, :]
    g_win = jnp.zeros((WIN_Y, WIN_X, c), jnp.float32)
    for ox in range(out):
        g_win = g_win + (t[:, ox, :][:, None, :]
                         * Bm[:, ox][None, :, None])

    for l in range(num_levels):
        @pl.when((lvl == l) & (ok == 1) & (cls == 0))
        def _(l=l):
            dst = outs[l].at[bi, pl.ds(y0, WIN_Y_S), pl.ds(x0, WIN_X_S), :]
            sub = win.at[:WIN_Y_S, :WIN_X_S, :]
            cp_in = pltpu.make_async_copy(dst, sub, sem_in)
            cp_in.start()
            cp_in.wait()
            win[:WIN_Y_S, :WIN_X_S, :] = (
                win[:WIN_Y_S, :WIN_X_S, :].astype(jnp.float32)
                + g_win[:WIN_Y_S, :WIN_X_S, :]).astype(table_dtype)
            cp_out = pltpu.make_async_copy(sub, dst, sem_out)
            cp_out.start()
            cp_out.wait()

        @pl.when((lvl == l) & (ok == 1) & (cls == 1))
        def _(l=l):
            dst = outs[l].at[bi, pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X), :]
            cp_in = pltpu.make_async_copy(dst, win, sem_in)
            cp_in.start()
            cp_in.wait()
            win[:] = (win[:].astype(jnp.float32) + g_win).astype(table_dtype)
            cp_out = pltpu.make_async_copy(win, dst, sem_out)
            cp_out.start()
            cp_out.wait()


def _fwd_kernel(num_levels, out, out8, c, feat_dtype,
                lvl_ref, bi_ref, y0_ref, x0_ref, ok_ref, cls_ref,
                a_ref, b_ref, *refs):
    """Forward: grid step = one roi; DMA its window in, contract with the
    slot-weight factors, write the (out, out, C) roi features block.
    ``out8`` pads the bin axis to a sublane multiple — Mosaic rejects
    broadcasts whose leading extent is below the 8-sublane tile."""
    feats = refs[:num_levels]
    out_ref = refs[num_levels]
    win = refs[num_levels + 1]
    sem_in = refs[num_levels + 2]

    r = pl.program_id(0)
    lvl = lvl_ref[r]
    bi = bi_ref[r]
    y0 = y0_ref[r]
    x0 = pl.multiple_of(x0_ref[r], 8)
    ok = ok_ref[r]
    cls = cls_ref[r]

    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for l in range(num_levels):
        @pl.when((lvl == l) & (ok == 1) & (cls == 0))
        def _(l=l):
            src = feats[l].at[bi, pl.ds(y0, WIN_Y_S), pl.ds(x0, WIN_X_S), :]
            cp = pltpu.make_async_copy(src, win.at[:WIN_Y_S, :WIN_X_S, :],
                                       sem_in)
            cp.start()
            # small-class rois have zero weights beyond the small window,
            # but stale scratch there can hold NaN bit patterns (0 * NaN
            # = NaN) — zero the margins (VMEM-only writes, sub-us)
            win[WIN_Y_S:, :, :] = jnp.zeros(
                (WIN_Y - WIN_Y_S, WIN_X, win.shape[-1]), win.dtype)
            win[:WIN_Y_S, WIN_X_S:, :] = jnp.zeros(
                (WIN_Y_S, WIN_X - WIN_X_S, win.shape[-1]), win.dtype)
            cp.wait()

        @pl.when((lvl == l) & (ok == 1) & (cls == 1))
        def _(l=l):
            src = feats[l].at[bi, pl.ds(y0, WIN_Y), pl.ds(x0, WIN_X), :]
            cp = pltpu.make_async_copy(src, win, sem_in)
            cp.start()
            cp.wait()

    @pl.when(ok == 1)
    def _():
        A = a_ref[0]                               # (WIN_Y, out8)
        Bm = b_ref[0]                              # (WIN_X, out8)
        w = win[:].astype(jnp.float32)             # (WIN_Y, WIN_X, C)
        # t[b, oy, c] = sum_a A[a, oy] w[a, b, c]
        t = jnp.zeros((WIN_X, out8, c), jnp.float32)
        for a in range(WIN_Y):
            t = t + A[a][None, :, None] * w[a][:, None, :]
        # o[oy, ox, c] = sum_b Bm[b, ox] t[b, oy, c]
        o = jnp.zeros((out8, out8, c), jnp.float32)
        for bx in range(WIN_X):
            o = o + Bm[bx][None, :, None] * t[bx][:, None, :]
        out_ref[0] = o[:out, :out, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out", "interpret"))
def roi_fwd_window_pallas(feats, meta, A, B, out: int,
                          interpret: bool = False):
    """RoIAlign forward as per-roi window DMA + factor contraction.

    Replaces the pair-table gather (one table build + 2C-wide gathers per
    sample point, ~38 ms/step on the flagship bench) with one strided
    window DMA per roi. Same A/B slot-weight factors as the backward —
    the bilinear sum is identical math, reassociated.

    Args:
        feats: list of (B, H_l, W_l, C); meta: 5x (R,) int32
        (level, batch, y0, x0, ok — ok=0 rois return ZERO rows, callers
        overwrite them via the exact gather pass).
        A: (R, WIN_Y, out), B: (R, WIN_X, out) f32.

    Returns (R, out, out, C) in the feature dtype.
    """
    num_levels = len(feats)
    r = meta[0].shape[0]
    c = feats[0].shape[-1]
    feat_dtype = feats[0].dtype
    out8 = ((out + 7) // 8) * 8
    pad = out8 - out
    if pad:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=(
            [pl.BlockSpec((1, WIN_Y, out8), lambda i, *m: (i, 0, 0)),
             pl.BlockSpec((1, WIN_X, out8), lambda i, *m: (i, 0, 0))]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels
        ),
        out_specs=pl.BlockSpec((1, out, out, c), lambda i, *m: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((WIN_Y, WIN_X, c), feat_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_fwd_kernel, num_levels, out, out8, c,
                               feat_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, out, out, c), feat_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*meta, A.astype(jnp.float32), B.astype(jnp.float32), *feats)


@functools.partial(jax.jit, static_argnames=("out", "interpret"))
def roi_bwd_window_pallas(d_feats, meta, dy, A, B, out: int,
                          interpret: bool = False):
    """Accumulate per-roi window gradients into the level feature grads.

    Args:
        d_feats: list of (B, H_l, W_l, C) arrays (the running gradient —
            aliased in-place). Every H_l >= WIN_Y and W_l >= WIN_X.
        meta: 6-tuple of (R,) int32 arrays (level, batch, y0, x0, ok,
            cls) —
            separate 1-D scalar-prefetch operands; a packed (R, 5) array
            would be lane-padded to (R, 128) in SMEM and overflow it.
        dy: (R, out, out, C) upstream grad.
        A: (R, WIN_Y, out), B: (R, WIN_X, out) f32 slot-weight factors.

    Returns the updated d_feats list.
    """
    num_levels = len(d_feats)
    r = meta[0].shape[0]
    c = dy.shape[-1]
    table_dtype = d_feats[0].dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=(
            [pl.BlockSpec((1, out, out, c),
                          lambda i, *m: (i, 0, 0, 0)),
             pl.BlockSpec((1, WIN_Y, out), lambda i, *m: (i, 0, 0)),
             pl.BlockSpec((1, WIN_X, out), lambda i, *m: (i, 0, 0))]
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_levels,
        scratch_shapes=[
            pltpu.VMEM((WIN_Y, WIN_X, c), table_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, num_levels, out, c, table_dtype)
    # inputs: [lvl, bi, y0, x0, ok, cls, dy, A, B, feats...]
    aliases = {9 + l: l for l in range(num_levels)}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(f.shape, f.dtype) for f in d_feats],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*meta, dy, A.astype(jnp.float32), B.astype(jnp.float32), *d_feats)
