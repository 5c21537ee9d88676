"""Merged-chain equivalence: OAMIX_CHAIN=merged vs the default slot-scan
dispatch under a shared draw table.

The merged depth step (ops/oamix_device.py _depth_step_merged) replaces
the per-slot lax.cond + lax.switch dispatch with one fused photometric
pass + one per-slot warp trio. Its contract is EXACT equivalence to the
slot dispatch (same ops, same draws, same kernels' lerp math), so the
composed outputs are compared bit-for-bit. This bisection harness caught
two real kernel bugs while the path was built: the PW_MAX_RESID=16
residual budget hit exactly by rotate's Y pass at C=4 (pallas_warp.py
MAX_RESID note), and an alpha-scaling mismatch in the bg blend.

Ref workload: mmdet/datasets/pipelines/oa_mix.py:207-236.
"""
import os

import numpy as np
import pytest

import tests.test_oamix_quantization as q

CFG = dict(num_views=2, severity=10, mixture_width=3,
           mixture_depth=-1, version="augmix.all", sigma_ratio=0.3,
           spatial_ratio=4, score_thresh=10)


def _both(t, monkeypatch):
    img = q._structured_image()
    monkeypatch.setenv("OAMIX_GEO_PW", "force")
    monkeypatch.setenv("OAMIX_CHAIN", "slots")
    a = np.asarray(q._device_out(img, t, CFG), np.float32)
    monkeypatch.setenv("OAMIX_CHAIN", "merged")
    b = np.asarray(q._device_out(img, t, CFG), np.float32)
    return a, b


@pytest.mark.slow
@pytest.mark.parametrize("seed,ops", [
    (1, list(range(9))),          # photometric families
    (13, [9, 10, 11]),            # bboxes_only rotate/shear/translate
    (11, [12, 13, 14]),           # bg_only rotate/shear/translate
    (7, list(range(15))),         # full mixed chain
])
def test_merged_chain_equals_slot_dispatch(monkeypatch, seed, ops):
    t = q._draw_table(seed, np.asarray(ops))
    a, b = _both(t, monkeypatch)
    d = np.abs(a - b)
    # bit-exact up to a vanishing +-1 reassociation tail (measured: all
    # four seeds exact on TPU; a mixed bb/bg seed showed +-1 on 7e-6 of
    # pixels — f32 blend reassociation at a rounding boundary)
    assert float(d.max()) <= 1.0, f"max diff {d.max()}"
    assert float((d > 0).mean()) <= 1e-4, f"mismatch frac {(d>0).mean()}"
