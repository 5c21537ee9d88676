"""hist256 (ops/pallas_hist.py) — the equalize histogram kernel.

CPU runs the XLA fallback; the Pallas path is exercised on-chip (validated
bit-exact vs numpy bincount and PIL equalize on TPU v5e)."""
import sys, os

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oadg_tpu.ops.pallas_hist import hist256


def test_hist256_matches_bincount():
    rng = np.random.RandomState(0)
    x = rng.uniform(-5, 261, (313, 77)).astype(np.float32)
    h = np.asarray(hist256(jnp.asarray(x)))
    ref = np.bincount(
        np.trunc(np.clip(x.reshape(-1), 0, 255)).astype(np.int64),
        minlength=256)
    assert h.shape == (256,)
    np.testing.assert_array_equal(h, ref)
    assert h.sum() == x.size


def test_hist256_empty_bins_and_saturation():
    x = np.full((64, 64), 300.0, np.float32)       # all clip to 255
    h = np.asarray(hist256(jnp.asarray(x)))
    assert h[255] == 64 * 64 and h[:255].sum() == 0
