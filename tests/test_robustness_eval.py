"""mPC/rPC aggregation math (reference robustness_eval.py:77-82:
P = results[0, 0]; mPC = mean(results[:, 1:]); rPC = mPC / P)."""
import os
import os.path as osp
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "analysis_tools"))

from oadg_tpu.ops.corruptions import BENCHMARK_CORRUPTIONS
import robustness_eval


def test_mpc_rpc_formulas(tmp_path):
    rng = np.random.RandomState(0)
    agg = {}
    expect = np.zeros((len(BENCHMARK_CORRUPTIONS), 6))
    for ci, corr in enumerate(BENCHMARK_CORRUPTIONS):
        agg[corr] = {}
        for sev in range(6):
            v = 0.4 if sev == 0 else float(rng.uniform(0.05, 0.35))
            agg[corr][sev] = {"bbox_mAP": v}
            expect[ci, sev] = v
    path = str(tmp_path / "agg.pkl")
    with open(path, "wb") as f:
        pickle.dump(agg, f)

    out = robustness_eval.get_results(path, dataset="coco", prints=None)
    assert out["P"] == pytest.approx(0.4)
    assert out["mPC"] == pytest.approx(float(np.mean(expect[:, 1:])))
    assert out["rPC"] == pytest.approx(out["mPC"] / 0.4)
    assert len(out["corruptions"]) == 15


def test_missing_cells_and_zero_clean(tmp_path):
    # missing severities count as 0 (the reference indexes a dense array);
    # zero clean P yields rPC 0 instead of a division error
    agg = {BENCHMARK_CORRUPTIONS[0]: {0: {"bbox_mAP": 0.0},
                                      1: {"bbox_mAP": 0.2}}}
    path = str(tmp_path / "agg.pkl")
    with open(path, "wb") as f:
        pickle.dump(agg, f)
    out = robustness_eval.get_results(path, dataset="coco", prints=None)
    assert out["P"] == 0.0 and out["rPC"] == 0.0
    assert out["mPC"] == pytest.approx(0.2 / 5.0)
