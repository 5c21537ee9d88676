"""Drive the analysis/publishing CLIs added for reference-tool parity:
coco_error_analysis (reference tools/analysis_tools/coco_error_analysis.py),
parse_txt2dict (parse_txt2dict.py), publish_model (publish_model.py)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_parse_txt2dict(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "analysis_tools"))
    import parse_txt2dict as p
    log = tmp_path / "rob.txt"
    lines = []
    lines.append("[gaussian_noise sev 0] " + str(
        {"bbox_mAP": 0.4, "bbox_mAP_50": 0.6, "bbox_mAP_s": 0.2,
         "bbox_mAP_m": 0.4, "bbox_mAP_l": 0.5, "AR@100": 0.5}))
    for sev in range(1, 6):
        lines.append(f"[gaussian_noise sev {sev}] " + str(
            {"bbox_mAP": 0.2, "bbox_mAP_50": 0.3, "AR@100": 0.3}))
        lines.append(f"[snow sev {sev}] " + str(
            {"bbox_mAP": 0.1, "bbox_mAP_50": 0.2, "AR@100": 0.2}))
    log.write_text("\n".join(lines))
    d = p.get_dictionary(str(log))
    assert d["gaussian_noise"]["severity0"]["average_precision"][
        "IoU=0.50:0.95|area=all|maxDets=100"] == "0.400"
    # mPC = mean over (5 gauss @ .2 + 5 snow @ .1) = .15
    assert d["mPC"]["average_precision"][
        "IoU=0.50:0.95|area=all|maxDets=100"] == "0.150"
    minimal = p.get_minimal_dictionary(d)
    assert minimal["cleanP_all"] == pytest.approx(0.4)
    assert minimal["gaussian_noise"] == pytest.approx(0.2)
    assert minimal["snow"] == pytest.approx(0.1)
    assert minimal["corr_mPC_all"] == pytest.approx(0.15)


def test_publish_model(tmp_path):
    from tools.model_converters.publish_model import process_checkpoint
    import orbax.checkpoint as ocp
    state = {"params": {"w": np.ones((3, 3), np.float32)},
             "opt_state": {"momentum": np.zeros((3, 3), np.float32)},
             "step": np.asarray(10)}
    src = str(tmp_path / "epoch_2")
    ocp.PyTreeCheckpointer().save(src, state, force=True)
    out = process_checkpoint(src, str(tmp_path / "published"))
    assert os.path.isdir(out)
    base = os.path.basename(out)
    assert base.startswith("published-") and len(base.split("-")[-1]) == 8
    from oadg_tpu.utils.checkpoint import orbax_restore
    pub = orbax_restore(out)
    assert "params" in pub and "opt_state" not in pub and "step" not in pub
    np.testing.assert_array_equal(pub["params"]["w"], state["params"]["w"])


def _tiny_coco(tmp_path):
    ann = {
        "images": [{"id": 1, "width": 100, "height": 100},
                   {"id": 2, "width": 100, "height": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [50, 50, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1,
             "bbox": [20, 20, 40, 40], "area": 1600, "iscrowd": 0},
        ],
        "categories": [
            {"id": 1, "name": "car", "supercategory": "vehicle"},
            {"id": 2, "name": "truck", "supercategory": "vehicle"},
        ],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    dets = [
        # img1: good car det, car det on the truck gt (class confusion)
        {"image_id": 1, "category_id": 1, "bbox": [11, 11, 20, 20],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 30, 30],
         "score": 0.8},
        # img2: offset car det (localization error)
        {"image_id": 2, "category_id": 1, "bbox": [30, 30, 40, 40],
         "score": 0.7},
    ]
    res_file = tmp_path / "res.json"
    res_file.write_text(json.dumps(dets))
    return str(ann_file), str(res_file)


def test_coco_error_analysis(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "analysis_tools"))
    import coco_error_analysis as cea
    ann_file, res_file = _tiny_coco(tmp_path)
    out = str(tmp_path / "out")
    cea.analyze_results(res_file, ann_file, ["bbox"], out, extraplots=True)
    pngs = os.listdir(os.path.join(out, "bbox"))
    assert any("car-allarea" in p for p in pngs)
    assert any("allclass-allarea" in p for p in pngs)
    assert any("bar plot" in p for p in pngs)
    # error-band APs must be monotone nondecreasing: C75<=C50<=Loc<=Sim<=Oth
    from oadg_tpu.core.evaluation.coco_eval import COCOEvalBbox
    coco, img_ids, cats, anns = cea.load_gt(ann_file)
    per_img = cea.load_results(res_file, img_ids, sorted(cats))
    gts = cea.build_gts(img_ids, anns)
    areas = (1024, 9216, 10000000000)
    ev = COCOEvalBbox(gts, per_img, sorted(cats), max_dets=(100,),
                      iou_thrs=[0.75, 0.5, 0.1],
                      area_ranges=cea.area_ranges_from(areas))
    ev.accumulate()
    base = ev.precision                     # (3, R, K, A, 1)
    k = 0                                   # car
    ps_super, ps_all = cea.analyze_individual_category(
        k, 1, cats, img_ids, anns, per_img, areas)
    def ap(x):
        x = np.where(x == -1, 0, x)
        return float(np.mean(x[:, 0]))      # allarea column
    c75, c50, loc = (ap(base[i, :, k]) for i in range(3))
    sim, oth = ap(ps_super), ap(ps_all)
    assert c75 <= c50 + 1e-9 <= loc + 1e-9
    assert loc <= sim + 1e-9 <= oth + 1e-9
    # the class-confused det (car on truck gt) is forgiven in Sim
    assert sim > loc
