"""Method-efficacy gate: OA-DG must BEAT plain training on robustness.

The overfit gate (test_overfit_map.py) proves the pipeline *learns*;
this test proves OA-DG *as a method* moves the needle the reference
claims it does (BASELINE.md table1: OA-DG 21.8 vs standard 15.4 mPC on
Cityscapes-C; reference tools/analysis_tools/test_robustness.py:221-254
is the measurement protocol).  Real Cityscapes-C is unavailable in this
environment, so the gate is the strongest in-repo analog:

  * train a tiny STANDARD Faster R-CNN and a tiny OA-DG Faster R-CNN on
    the same 4-image synthetic set, same budget, same seed policy;
  * evaluate BOTH on the clean set and on 4 in-repo corruption types at
    severity 3 (ops/corruptions.py, the reference's imagecorruptions
    protocol) through the REAL ckpt -> tools/test.py -> COCO-eval path;
  * assert clean mAP parity (both overfit the trivial task) and that
    OA-DG's mPC (mean corrupted mAP50, reference
    robustness_eval.get_results 'mPC' aggregation) >= standard's.

The synthetic task makes class identity depend on COLOR, so photometric
corruptions genuinely attack what a plainly-trained model memorized
while OA-Mix's augmentation chain covers the shift — the same mechanism
the paper exploits (reference configs/OA-DG/README.md).
"""
import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

from test_overfit_map import (CONFIG_TEMPLATE, H, N_IMGS, W, make_dataset,
                              eval_via_tools_test)

CORRUPTIONS = ("gaussian_noise", "fog", "brightness", "contrast")
SEVERITY = 3

# Plain Faster R-CNN, SAME backbone/neck/anchor settings as the OA-DG
# template, single view, vanilla losses, StandardRoIHead — the tiny analog
# of the reference's standard baseline
# (/root/reference/configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py).
def _checked_replace(template, old, new):
    assert old in template, f"overfit template drifted; missing:\n{old}"
    return template.replace(old, new)


def _standard_template():
    t = CONFIG_TEMPLATE
    for old, new in (
        ("num_views = {num_views}", "num_views = 1"),
        ("type='ContrastiveRoIHead'", "type='StandardRoIHead'"),
        ("loss_cls=dict(type='CrossEntropyLossPlus', use_sigmoid=True,\n"
         "                      loss_weight=1.0, num_views=num_views,\n"
         "                      additional_loss='jsdv1_3_2aug', lambda_weight=0.1)",
         "loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,\n"
         "                      loss_weight=1.0)"),
        ("loss_bbox=dict(type='L1LossPlus', loss_weight=1.0,\n"
         "                       num_views=num_views, additional_loss='None')",
         "loss_bbox=dict(type='L1Loss', loss_weight=1.0)"),
        ("type='Shared2FCContrastiveHead'", "type='Shared2FCBBoxHead'"),
        ("cont_predictor_cfg=dict(num_linear=2, feat_channels=16),\n", ""),
        ("loss_cls=dict(type='CrossEntropyLossPlus', use_sigmoid=False,\n"
         "                          loss_weight=1.0, num_views=num_views,\n"
         "                          additional_loss='jsdv1_3_2aug', lambda_weight=10)",
         "loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,\n"
         "                          loss_weight=1.0)"),
        ("loss_bbox=dict(type='SmoothL1LossPlus', beta=1.0, loss_weight=1.0,\n"
         "                           num_views=num_views, additional_loss='None'),\n",
         "loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.0))),\n"),
        ("            loss_cont=dict(type='ContrastiveLossPlus', loss_weight=0.01,\n"
         "                           temperature=0.06, num_views=num_views,\n"
         "                           min_samples=2))),\n", ""),
        ("        random_proposal_cfg=dict(bbox_from='oagrb', num_bboxes=4,\n"
         "                                 scales=(0.01, 0.3), ratios=(0.3, 1 / 0.3),\n"
         "                                 iou_max=0.7)),\n", "        ),\n"),
        ("    dict(type='OAMix', version='augmix', num_views=num_views,\n"
         "         keep_orig=True, severity=10),\n", ""),
        ("    dict(type='Collect', keys=['img', 'img2', 'gt_bboxes', 'gt_bboxes2',\n"
         "                               'gt_labels', 'multilevel_boxes',\n"
         "                               'oamix_boxes']),\n",
         "    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),\n"),
    ):
        t = _checked_replace(t, old, new)
    return t


STANDARD_TEMPLATE = _standard_template()

# Corrupted test pipeline: corruption applied on the original decoded
# image before resize, exactly like the reference robustness protocol
# (/root/reference/tools/analysis_tools/test_robustness.py:321-332
# inserts dict(type='Corrupt', ...) right after LoadImageFromFile).
_CLEAN_LOAD = "test_pipeline = [\n    dict(type='LoadImageFromFile'),\n"
_CORRUPT_LOAD = ("test_pipeline = [\n    dict(type='LoadImageFromFile'),\n"
                 "    dict(type='Corrupt', corruption='{corruption}',"
                 " severity={severity}),\n")


def _sanity_check_templates():
    assert "OAMix" not in STANDARD_TEMPLATE
    assert "Contrastive" not in STANDARD_TEMPLATE
    assert "Plus" not in STANDARD_TEMPLATE.split("img_norm_cfg")[0]
    assert _CLEAN_LOAD in STANDARD_TEMPLATE


def _write_cfg(tmp_path, name, template, root, corruption=None,
               epochs=12, num_views=2):
    if corruption is not None:
        template = template.replace(_CLEAN_LOAD, _CORRUPT_LOAD.format(
            corruption=corruption, severity=SEVERITY))
    cfg_path = tmp_path / f"{name}.py"
    cfg_path.write_text(template.format(
        num_views=num_views, w=W, h=H, root=str(root), repeat=25,
        epochs=epochs, lr=0.02, decay_epoch=max(epochs - 4, 1)))
    return str(cfg_path)


def _train(cfg_path, work_dir, num_views):
    from oadg_tpu.apis import train_detector
    from oadg_tpu.config import Config
    from oadg_tpu.models import build_detector
    cfg = Config.fromfile(cfg_path)
    cfg["work_dir"] = work_dir
    det = build_detector(dict(cfg.model), num_views=num_views)
    return train_detector(det, dict(cfg.data.train), cfg, validate=False,
                          num_views=num_views, work_dir=work_dir)


def _eval_suite(tmp_path, name, template, root, ckpt, epochs, num_views):
    """clean mAP50 + per-corruption mAP50 through the real test CLI."""
    out = {}
    for corruption in (None,) + CORRUPTIONS:
        tag = corruption or "clean"
        cfg_path = _write_cfg(tmp_path, f"{name}_{tag}", template, root,
                              corruption=corruption, epochs=epochs,
                              num_views=num_views)
        metrics = _eval(cfg_path, ckpt)
        out[tag] = metrics["bbox_mAP_50"]
    return out


def _eval(cfg_path, ckpt):
    metrics = eval_via_tools_test(cfg_path, ckpt)
    assert metrics is not None and "bbox_mAP_50" in metrics, metrics
    return metrics


# Strictly positive mPC margin the gate enforces (VERDICT r4 item 4).
# Chosen below the smallest margin measured across seeds 0/1 on this
# fixture (see EFFICACY.json + STATUS.md "Method-efficacy numbers"):
# a tie or sub-margin win now FAILS the gate.
MPC_MARGIN = float(os.environ.get("OADG_EFFICACY_MARGIN", "0.05"))


@pytest.mark.slow
def test_oadg_beats_standard_on_corruption_robustness(tmp_path):
    _sanity_check_templates()
    root = tmp_path / "data"
    root.mkdir()
    make_dataset(root)
    epochs = int(os.environ.get("OADG_EFFICACY_EPOCHS", "12"))
    seed = int(os.environ.get("OADG_EFFICACY_SEED", "0"))

    results = {}
    for name, template, num_views in (
            ("standard", STANDARD_TEMPLATE, 1),
            ("oadg", CONFIG_TEMPLATE, 2)):
        template = _checked_replace(template, "seed = 0", f"seed = {seed}")
        cfg_path = _write_cfg(tmp_path, f"{name}_train", template, root,
                              epochs=epochs, num_views=num_views)
        work_dir = str(tmp_path / f"work_{name}")
        runner = _train(cfg_path, work_dir, num_views)
        ckpt = osp.join(work_dir, "checkpoints", f"epoch_{runner.epoch}")
        assert osp.isdir(ckpt), ckpt
        results[name] = _eval_suite(tmp_path, name, template, root, ckpt,
                                    epochs, num_views)

    std, oadg = results["standard"], results["oadg"]
    std_mpc = float(np.mean([std[c] for c in CORRUPTIONS]))
    oadg_mpc = float(np.mean([oadg[c] for c in CORRUPTIONS]))
    print(f"standard: clean={std['clean']:.3f} mPC={std_mpc:.3f} {std}")
    print(f"oadg:     clean={oadg['clean']:.3f} mPC={oadg_mpc:.3f} {oadg}")
    record = dict(seed=seed, epochs=epochs, corruptions=list(CORRUPTIONS),
                  severity=SEVERITY, standard=std, oadg=oadg,
                  std_mpc=std_mpc, oadg_mpc=oadg_mpc,
                  margin=oadg_mpc - std_mpc)
    out_path = os.environ.get("OADG_EFFICACY_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
    print("EFFICACY_RECORD " + json.dumps(record))

    # both must solve the trivial clean task (same gate as the overfit test
    # at mAP50; the standard model is the sanity anchor)
    assert std["clean"] >= 0.8, results
    assert oadg["clean"] >= 0.8, results
    # the method claim with a STRICT margin: OA-DG must beat standard
    # under corruption by at least MPC_MARGIN (reference table1: +6.4 mPC;
    # a tie no longer passes — VERDICT r4 item 4)
    assert oadg_mpc >= std_mpc + MPC_MARGIN, (
        f"OA-DG mPC {oadg_mpc:.3f} < standard {std_mpc:.3f} + "
        f"margin {MPC_MARGIN}: {results}")
    # and the gap must not come from clean-accuracy collapse
    assert oadg["clean"] >= std["clean"] - 0.15, results
