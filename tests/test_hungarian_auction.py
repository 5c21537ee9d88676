"""On-device auction assignment vs scipy exact LSA (reference semantics:
mmdet/core/bbox/assigners/hungarian_assigner.py:1-146 uses
scipy.optimize.linear_sum_assignment). The auction must produce a valid
matching whose total cost is within a small tolerance of optimal on
random cost matrices up to 300 queries x 128 gts."""
import numpy as np
import pytest

import jax.numpy as jnp

from oadg_tpu.core.bbox.hungarian import auction_assign

scipy_opt = pytest.importorskip("scipy.optimize")


def _check(cost, n_valid, seed, rel_tol=2e-3):
    q, g = cost.shape
    gt_valid = np.zeros(g, bool)
    gt_valid[:n_valid] = True
    assigned = np.asarray(auction_assign(jnp.asarray(cost),
                                         jnp.asarray(gt_valid)))
    # validity: each valid gt matched exactly once, to a distinct row
    matched_rows = np.nonzero(assigned > 0)[0]
    matched_gts = assigned[matched_rows] - 1
    assert len(matched_rows) == n_valid, (
        f"{len(matched_rows)} matches for {n_valid} gts (seed {seed})")
    assert len(set(matched_gts.tolist())) == n_valid
    assert (matched_gts < n_valid).all()

    total = cost[matched_rows, matched_gts].sum()
    r, c = scipy_opt.linear_sum_assignment(cost[:, :n_valid].astype(np.float64))
    opt = cost[r, c].sum()
    scale = max(np.abs(cost[:, :n_valid]).max(), 1e-3)
    assert total <= opt + rel_tol * scale * max(n_valid, 1), (
        f"auction {total:.6f} vs optimal {opt:.6f} (seed {seed})")


@pytest.mark.parametrize("q,g,n_valid", [
    (10, 10, 10), (10, 8, 5), (50, 32, 32), (100, 64, 40),
    (300, 128, 128), (300, 128, 7), (100, 16, 1),
])
def test_auction_matches_scipy(q, g, n_valid):
    for seed in range(3):
        rng = np.random.RandomState(seed + q + g)
        cost = rng.randn(q, g).astype(np.float32) * 5.0
        _check(cost, n_valid, seed)


def test_auction_detr_like_costs():
    """DETR-style structured costs: cls in [-1,0], l1 in [0,8], giou in
    [-2,2] — near-ties are common; total cost must still be ~optimal."""
    for seed in range(3):
        rng = np.random.RandomState(seed)
        q, g = 100, 20
        cost = (-rng.rand(q, g) + 5 * rng.rand(q, g)
                + 2 * (2 * rng.rand(q, g) - 1)).astype(np.float32)
        _check(cost, g, seed)


def test_auction_no_valid_gts():
    cost = np.random.RandomState(0).randn(20, 8).astype(np.float32)
    assigned = np.asarray(auction_assign(jnp.asarray(cost),
                                         jnp.zeros(8, bool)))
    assert (assigned == 0).all()


def test_auction_duplicate_columns():
    """Identical gts (exact ties) — eps-bidding must still terminate with
    a valid one-to-one matching."""
    rng = np.random.RandomState(1)
    col = rng.randn(50, 1).astype(np.float32)
    cost = np.tile(col, (1, 6))
    _check(cost, 6, 1, rel_tol=5e-3)
