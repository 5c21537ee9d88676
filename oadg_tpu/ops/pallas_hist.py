"""Pallas 256-bin histogram for the PIL-exact photometric ops.

``equalize`` needs a full 256-bin histogram per channel (reference PIL
ImageOps.equalize via augmix.py:64-106). The XLA compare-reduce form
(``sum(x[:, None] == bins)``, output (256,)) re-reads the 2M-pixel image
once PER BIN — ~6 GB of HBM traffic per call, measured ~7 ms and the
single largest OA-Mix op after the warps.

Two formulations live here:
- ``hist256`` — VMEM-resident Pallas kernel: tiles the image through
  VMEM once with 256 per-lane accumulators resident (one read of the
  image, but 256 equality compares per element — compute-bound at
  ~1.6 ms/channel for 2M pixels).
- ``hist256_nibble`` — the nibble-matmul identity on the MXU:
  hist[16*hi + lo] = (HI_onehot^T @ LO_onehot)[hi, lo] — 32 compares
  per element + one contraction. Plain XLA (Mosaic cannot lay out
  per-element one-hot rows: a lane->sublane reshape). Exact: the 0/1
  bf16 products are exact and the f32 MXU accumulator is exact for
  counts < 2^24.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
ROWS = 512                     # tile rows: (ROWS, LANES) f32 = 256 KB


def _hist_kernel(x_ref, out_ref):
    """x_ref: (ROWS, LANES) f32 tile of values in [0, 256) (pad = 256+).
    out_ref: (256, LANES) f32 per-lane bin counts, accumulated across the
    sequential grid (initialized at the first step)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # int32 equality, bins in groups of 8 so every store is a full
    # (8, 128) register tile. Measured on v5e for one 2M-pixel channel:
    # f32 compares 31 ms, single-row f32 stores 46 ms, THIS form 1.6 ms
    # (the XLA compare-reduce it replaces: ~2.4 ms of pure HBM re-reads).
    x = x_ref[:].astype(jnp.int32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
    for g in range(32):
        cmp = (x[None, :, :] == (bins + g * 8)).astype(jnp.float32)
        out_ref[g * 8:(g + 1) * 8, :] = (
            out_ref[g * 8:(g + 1) * 8, :] + jnp.sum(cmp, axis=1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def hist256_nibble(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """256-bin histogram via the nibble-matmul identity (see module
    docstring). Same contract as hist256; ~6x faster at 2M pixels."""
    flat = jnp.trunc(jnp.clip(x.reshape(-1).astype(jnp.float32), 0, 255))
    if interpret or jax.devices()[0].platform == "cpu":
        bins = jnp.arange(256, dtype=jnp.float32)
        return jnp.sum(flat[None, :] == bins[:, None], axis=1,
                       dtype=jnp.int32)
    hi = jnp.floor(flat * (1.0 / 16.0))
    lo = flat - hi * 16.0
    nib = jnp.arange(16, dtype=jnp.float32)
    t_hi = (hi[:, None] == nib).astype(jnp.bfloat16)        # (N, 16)
    t_lo = (lo[:, None] == nib).astype(jnp.bfloat16)
    hl = jax.lax.dot_general(t_hi, t_lo, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return hl.reshape(256).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hist256(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """256-bin histogram of ``x`` (any shape) of values in [0, 255]
    (values are truncated to integers first). Returns (256,) int32."""
    from jax.experimental.pallas import tpu as pltpu

    flat = jnp.trunc(jnp.clip(x.reshape(-1).astype(jnp.float32), 0, 255))
    if interpret or jax.devices()[0].platform == "cpu":
        bins = jnp.arange(256, dtype=jnp.float32)
        return jnp.sum(flat[None, :] == bins[:, None], axis=1,
                       dtype=jnp.int32)
    n = flat.shape[0]
    tile = ROWS * LANES
    pad = (-n) % tile
    flat = jnp.pad(flat, (0, pad), constant_values=256.0)   # 256 hits no bin
    t = flat.shape[0] // tile
    xt = flat.reshape(t * ROWS, LANES)
    lanes = pl.pallas_call(
        _hist_kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, LANES), jnp.float32),
    )(xt)
    return jnp.sum(lanes, axis=1).astype(jnp.int32)
