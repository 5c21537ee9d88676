"""Pallas kernel for the OA-Mix foreground mask maps.

Computes, in ONE pass over the image, the three per-pixel reductions over
G blurred box masks (separable: m_i(y, x) = fy[i, y] * fx[i, x]):
  best_id = argmax_i m_i        (strongest-box assignment)
  cover   = 1 - prod_i (1-m_i)  (combined coverage)
  union   = max_i m_i

XLA forms (fori_loop carries, or broadcast+reduce over the box axis)
materialize full-res intermediates per box — measured 33-130 ms/image at
(1024, 2048, G=16). Here each (BH, BW) tile keeps all accumulators in VMEM
and loops the G boxes in registers: only the three outputs touch HBM.
~10-20x faster.

Reference semantics: oa_mix.py:74-93 mask construction +
the strongest-box / coverage composition documented in oamix_device.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


BID_EPS = 1e-5      # best mask below this -> identity sentinel id G: the
# blend weight there is < G*eps (~2e-4, <=0.04 intensity), while the
# argmax would otherwise spray arbitrary far-box ids Voronoi-style
# across the whole image and multiply the piecewise-warp kernels'
# per-block work (presence tracks ids per 8-row block).


def _fg_kernel(fx_ref, fy_ref, bid_ref, cover_ref, union_ref, *, g: int):
    fy = fy_ref[...]                       # (G, BH)
    fx = fx_ref[...]                       # (G, BW)
    bh, bw = bid_ref.shape
    best = jnp.full((bh, bw), -1.0, jnp.float32)
    bid = jnp.full((bh, bw), float(g), jnp.float32)
    one_minus = jnp.ones((bh, bw), jnp.float32)
    union = jnp.zeros((bh, bw), jnp.float32)
    for i in range(g):                     # static unroll, all in VMEM
        m = fy[i][:, None] * fx[i][None, :]
        better = (m > best) & (m >= BID_EPS)
        best = jnp.where(better, m, best)
        bid = jnp.where(better, float(i), bid)
        one_minus = one_minus * (1.0 - m)
        union = jnp.maximum(union, m)
    bid_ref[...] = bid
    cover_ref[...] = 1.0 - one_minus
    union_ref[...] = union


def fg_maps_pallas(fx, fy, h: int, w: int, block_h: int = 256,
                   block_w: int = 512):
    """fx (G, W), fy (G, H) gated 1-D profiles -> (best_id int8,
    cover bf16, union bf16), each (H, W)."""
    g = fx.shape[0]
    bh, bw = min(block_h, h), min(block_w, w)
    grid = (h // bh, w // bw)
    bid, cover, union = pl.pallas_call(
        functools.partial(_fg_kernel, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, bw), lambda i, j: (0, j)),
            pl.BlockSpec((g, bh), lambda i, j: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ],
    )(fx.astype(jnp.float32), fy.astype(jnp.float32))
    return (bid.astype(jnp.int8), jnp.clip(cover, 0.0, 1.0).astype(jnp.bfloat16),
            union.astype(jnp.bfloat16))


def fg_maps_xla(fx, fy, h: int, w: int):
    """CPU/fallback path: box-major broadcast-reduce (the fastest XLA form)."""
    g = fx.shape[0]
    m = fy[:, :, None] * fx[:, None, :]            # (G, H, W)
    best = jnp.max(m, axis=0)
    best_id = jnp.where(best >= BID_EPS, jnp.argmax(m, axis=0),
                        g).astype(jnp.int8)
    cover = jnp.clip(1.0 - jnp.prod(1.0 - m, axis=0), 0.0, 1.0)
    return best_id, cover.astype(jnp.bfloat16), best.astype(jnp.bfloat16)


def fg_maps(fx, fy, h: int, w: int):
    if jax.default_backend() in ("tpu", "axon") and h % 8 == 0 and \
            w % 128 == 0:
        # pick tile sizes that divide the image
        bh = next(b for b in (256, 128, 64, 32, 16, 8) if h % b == 0)
        bw = next(b for b in (512, 256, 128) if w % b == 0)
        return fg_maps_pallas(fx, fy, h, w, bh, bw)
    return fg_maps_xla(fx, fy, h, w)
