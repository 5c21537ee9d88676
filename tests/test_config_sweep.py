"""Build every config under configs/ (reference
tests/test_runtime/test_config.py pattern): catches registry/schema breakage
across the whole config surface."""
import glob
import os.path as osp

import pytest

from oadg_tpu.config import Config
from oadg_tpu.utils.registry import PIPELINES, build_from_cfg

CFG_ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "configs")
ALL_CONFIGS = sorted(
    p for p in glob.glob(osp.join(CFG_ROOT, "**", "*.py"), recursive=True)
    if "_base_" not in p)


@pytest.mark.parametrize("cfg_path", ALL_CONFIGS,
                         ids=[osp.relpath(p, CFG_ROOT) for p in ALL_CONFIGS])
def test_config_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert "model" in cfg

    from oadg_tpu.models import build_detector
    num_views = int(cfg.get("num_views", 1) or 1)
    det = build_detector(dict(cfg.model), num_views=num_views)
    assert det is not None

    # every pipeline op must be constructible
    def check_pipeline(p):
        for op in p or []:
            op = dict(op)
            t = op.get("type")
            if t == "MultiScaleFlipAug":
                check_pipeline(op.get("transforms"))
                continue
            built = build_from_cfg(op, PIPELINES)
            assert built is not None, t

    data = cfg.get("data") or {}
    for split in ("train", "val", "test"):
        d = data.get(split)
        if d is None:
            continue
        ds = d if isinstance(d, list) else [d]
        for item in ds:
            item = dict(item)
            while item.get("type") in ("RepeatDataset", "ClassBalancedDataset"):
                item = dict(item["dataset"])
            check_pipeline(item.get("pipeline"))
