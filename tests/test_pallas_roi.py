"""RoIAlign pallas window kernels (ops/pallas_roi_bwd.py) — interpret-mode
parity on CPU against the exact XLA implementations. The real-TPU parity
at flagship shapes is exercised by the bench (the kernels are the default
path on TPU).

Covers both window classes (small 16x24 / full 32x40), the extreme-aspect
violator fallback, and the sub-window-level fallback.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oadg_tpu.ops.roi_align import (_roi_align_multilevel_impl,
                                    _roi_align_forward,
                                    roi_align_multilevel)


@pytest.fixture
def fixture():
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.rand(2, 64 >> i, 96 >> i, 8).astype(np.float32))
             for i in range(2)]
    rois = jnp.asarray(np.array([
        [0, 10, 10, 40, 40],       # small window class
        [1, 4, 8, 150, 160],       # full window class
        [0, 0, 0, 370, 20],        # extreme aspect -> violator fallback
        [1, -5, 3, 190, 120],
        [0, 100, 100, 108, 108],   # tiny
    ], np.float32))
    return feats, rois


def test_fwd_window_kernel_matches_impl(fixture, monkeypatch):
    feats, rois = fixture
    monkeypatch.setenv("OADG_ROI_FWD", "pallas")
    got = jax.jit(lambda fs: _roi_align_forward(
        fs, rois, 7, (4, 8), 2, 56, 256))(feats)
    monkeypatch.setenv("OADG_ROI_FWD", "impl")
    want = jax.jit(lambda fs: _roi_align_multilevel_impl(
        fs, rois, output_size=7, featmap_strides=(4, 8),
        sampling_ratio=2, finest_scale=56, chunk=256))(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_bwd_window_kernel_matches_autodiff(fixture, monkeypatch):
    feats, rois = fixture
    g_out = jnp.asarray(np.random.RandomState(5)
                        .rand(5, 7, 7, 8).astype(np.float32))

    def loss_custom(fs):
        return jnp.sum(roi_align_multilevel(fs, rois, 7, (4, 8), 2, 56) *
                       g_out)

    def loss_auto(fs):
        return jnp.sum(_roi_align_multilevel_impl(
            fs, rois, output_size=7, featmap_strides=(4, 8),
            sampling_ratio=2, finest_scale=56, chunk=256) * g_out)

    monkeypatch.setenv("OADG_ROI_BWD", "pallas")
    monkeypatch.setenv("OADG_ROI_FWD", "impl")
    gc = jax.grad(loss_custom)(list(feats))
    ga = jax.grad(loss_auto)(list(feats))
    for a, b in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-6)


def test_small_levels_fall_back(monkeypatch):
    """Levels below the DMA window never reach the kernel; everything is
    still exact through the tap/gather fallback."""
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.rand(1, 64, 96, 8).astype(np.float32)),
             jnp.asarray(rng.rand(1, 8, 12, 8).astype(np.float32))]
    rois = jnp.asarray(np.array([
        [0, 5, 5, 30, 30],
        [0, 0, 0, 180, 170],      # maps to the tiny level
    ], np.float32))
    monkeypatch.setenv("OADG_ROI_FWD", "pallas")
    monkeypatch.setenv("OADG_ROI_BWD", "pallas")
    got = jax.jit(lambda fs: _roi_align_forward(
        fs, rois, 7, (4, 8), 2, 56, 256))(feats)
    monkeypatch.setenv("OADG_ROI_FWD", "impl")
    want = jax.jit(lambda fs: _roi_align_multilevel_impl(
        fs, rois, output_size=7, featmap_strides=(4, 8),
        sampling_ratio=2, finest_scale=56, chunk=256))(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_violator_window_passes(monkeypatch):
    """Extreme-aspect rois are handled by the big-window violator passes
    (tall+coarse (64,64)/(32,64) and wide (32,128) — ops/roi_align.py
    _violator_window_meta) and bit-match the exact XLA path; rois beyond
    both windows still fall through to the exact gather pass."""
    from oadg_tpu.ops.roi_align import (_violator_window_meta,
                                        map_roi_levels)
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.rand(1, 64, 160, 8).astype(np.float32)),
             jnp.asarray(rng.rand(1, 32, 80, 8).astype(np.float32))]
    rois = jnp.asarray(np.array([
        [0, 20, 10, 50, 240],      # tall: y span ~54 -> pass A full
        [0, 0, 40, 400, 60],       # wide: x span ~94 -> pass B
        [0, 10, 10, 40, 40],       # compact (main pass)
        [0, 0, 0, 620, 80],        # level-1 x span ~72 -> exact fallback
    ], np.float32))

    hs = np.array([f.shape[1] for f in feats])
    ws = np.array([f.shape[2] for f in feats])
    level_off = np.concatenate([[0], np.cumsum(1 * hs * ws)[:-1]])
    shapes = [(f.shape, f.dtype) for f in feats]
    passA, passB, covered = _violator_window_meta(
        rois, 7, (4, 8), 56, 2, hs, ws, level_off, shapes)
    assert passA is not None and passB is not None
    ha = np.asarray(passA["handled"])
    hb = np.asarray(passB["handled"])
    assert ha[0] and not hb[0]          # tall -> A
    assert hb[1] and not ha[1]          # wide -> B
    assert not np.asarray(covered)[3]   # beyond both -> exact

    monkeypatch.setenv("OADG_ROI_FWD", "pallas")
    monkeypatch.setenv("OADG_ROI_BWD", "pallas")
    got = jax.jit(lambda fs: _roi_align_forward(
        fs, rois, 7, (4, 8), 2, 56, 256))(feats)
    monkeypatch.setenv("OADG_ROI_FWD", "impl")
    want = jax.jit(lambda fs: _roi_align_multilevel_impl(
        fs, rois, output_size=7, featmap_strides=(4, 8),
        sampling_ratio=2, finest_scale=56, chunk=256))(feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    g_out = jnp.asarray(rng.rand(4, 7, 7, 8).astype(np.float32))

    def loss_custom(fs):
        return jnp.sum(roi_align_multilevel(fs, rois, 7, (4, 8), 2, 56) *
                       g_out)

    def loss_auto(fs):
        return jnp.sum(_roi_align_multilevel_impl(
            fs, rois, output_size=7, featmap_strides=(4, 8),
            sampling_ratio=2, finest_scale=56, chunk=256) * g_out)

    monkeypatch.setenv("OADG_ROI_BWD", "pallas")
    gc = jax.grad(loss_custom)(list(feats))
    ga = jax.grad(loss_auto)(list(feats))
    # atol 1e-5 (not the main-pass 2e-6): the wide (32,128) window's
    # factor contraction reassociates ~128-long f32 sums
    for a, b in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_exact_tap_contingency_per_level_scatter(monkeypatch):
    """Rois the big-window violator passes can't handle route through the
    exact tap while-loop (32-slot scatter iterations over the flat
    gradient table). This fixture forces >=2 such rois spanning BOTH
    levels, so the loop's cross-level row bookkeeping is exercised with
    nonzero updates — a path the standard fixtures leave at zero
    iterations. (A per-level-scatter rewrite of this contingency was
    measured SLOWER in the full bench — 0.3389 vs 0.3265 s/step, the
    4-array while carry forces copies — and reverted; this test pins
    the exact path's correctness under either form.)
    Ref op replaced: mmcv CUDA roi_align backward (atomicAdd taps)."""
    from oadg_tpu.ops.roi_align import (_roi_align_multilevel_impl,
                                        _violator_window_meta,
                                        _window_meta, roi_align_multilevel)
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.rand(2, 64, 96, 8).astype(np.float32)),
             jnp.asarray(rng.rand(2, 32, 48, 8).astype(np.float32))]
    rois = jnp.asarray(np.array([
        [0, 0, 0, 380, 250],      # huge both-axis span -> beyond passes
        [1, 0, 0, 370, 16],       # extreme wide -> beyond passes
        [0, 2, 2, 18, 252],       # extreme tall (pass-handled)
        [1, 10, 10, 40, 40],      # normal window roi
    ], np.float32))
    # preflight: assert the fixture really exercises the exact path
    hs, ws = np.array([64, 32]), np.array([96, 48])
    level_off = np.array([0, 2 * 64 * 96])
    shapes = [(f.shape, f.dtype) for f in feats]
    _, _, _, compact, _ = _window_meta(rois, 7, (4, 8), 56, 2, hs, ws,
                                       level_off, shapes)
    viol = ~np.asarray(compact)
    pA, pB, _ = _violator_window_meta(rois, 7, (4, 8), 56, 2, hs, ws,
                                      level_off, shapes)
    handled = np.zeros_like(viol)
    for p in (pA, pB):
        if p is not None:
            handled |= np.asarray(p["handled"]) & viol
    assert (viol & ~handled).sum() >= 2, "fixture no longer forces the exact path"

    g_out = jnp.asarray(np.random.RandomState(5)
                        .rand(4, 7, 7, 8).astype(np.float32))
    monkeypatch.setenv("OADG_ROI_BWD", "pallas")
    monkeypatch.setenv("OADG_ROI_FWD", "impl")
    gc = jax.grad(lambda fs: jnp.sum(
        roi_align_multilevel(fs, rois, 7, (4, 8), 2, 56) * g_out))(
        list(feats))
    ga = jax.grad(lambda fs: jnp.sum(_roi_align_multilevel_impl(
        fs, rois, output_size=7, featmap_strides=(4, 8), sampling_ratio=2,
        finest_scale=56, chunk=256) * g_out))(list(feats))
    for a, b in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-6)
