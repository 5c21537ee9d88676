"""AOT deployment round trip: export_aot serializes the jitted inference
function to StableHLO; test_aot evaluates the artifact WITHOUT the Python
model (reference analog: tools/deployment/pytorch2onnx.py + test.py)."""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from tests.test_tools_integration import tiny_setup  # noqa: F401 fixture


def test_export_and_test_aot(tiny_setup, tmp_path, monkeypatch):  # noqa: F811
    cfg_path, root = tiny_setup
    out = str(tmp_path / "model_exported.bin")

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools", "deployment"))
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    import export_aot
    monkeypatch.setattr(sys, "argv", [
        "export_aot.py", cfg_path, "--out", out, "--shape", "64", "96"])
    export_aot.main()
    assert osp.getsize(out) > 1000

    import test_aot
    monkeypatch.setattr(sys, "argv", [
        "test_aot.py", cfg_path, out, "--eval", "bbox",
        "--out", str(tmp_path / "res.pkl")])
    test_aot.main()                     # prints metrics; must not raise
    assert osp.exists(str(tmp_path / "res.pkl"))
