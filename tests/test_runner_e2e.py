"""End-to-end training smoke: tiny synthetic COCO dataset -> tools-style
train flow (loader, runner, hooks, checkpoint, resume, eval) on CPU."""
import json
import os

import numpy as np
import pytest

import cv2

from oadg_tpu.config import Config
from oadg_tpu.data import build_dataloader, build_dataset
from oadg_tpu.models import build_detector


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    (root / "imgs").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(6):
        h, w = 64, 96
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        name = f"img{i}.png"
        cv2.imwrite(str(root / "imgs" / name), img)
        images.append(dict(id=i, file_name=name, width=w, height=h))
        annotations.append(dict(id=2 * i, image_id=i, category_id=1,
                                bbox=[8, 8, 30, 25], area=750, iscrowd=0))
        annotations.append(dict(id=2 * i + 1, image_id=i, category_id=2,
                                bbox=[50, 20, 30, 30], area=900, iscrowd=0))
    ann = root / "ann.json"
    ann.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name='person'), dict(id=2, name='car')])))
    return str(ann), str(root / "imgs")


def _cfg(ann_file, img_prefix, work_dir):
    from tests.test_forward import BASE_MODEL, TEST_CFG, TRAIN_CFG
    model = dict(BASE_MODEL)
    model["roi_head"] = dict(model["roi_head"])
    model["roi_head"]["bbox_head"] = dict(model["roi_head"]["bbox_head"],
                                          num_classes=2)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]
    return Config(dict(
        model=dict(model, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG),
        data=dict(samples_per_gpu=2, workers_per_gpu=1,
                  train=dict(type='CocoDataset', ann_file=ann_file,
                             img_prefix=img_prefix,
                             classes=('person', 'car'), pipeline=pipeline)),
        optimizer=dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=None),
        lr_config=dict(policy='step', warmup='linear', warmup_iters=2,
                       warmup_ratio=0.1, step=[1]),
        runner=dict(type='EpochBasedRunner', max_epochs=2),
        log_config=dict(interval=1),
        checkpoint_config=dict(interval=1),
        custom_hooks=[dict(type='CheckLossHook', interval=1),
                      dict(type='NumClassCheckHook')],
        work_dir=work_dir, seed=0))


def test_train_loop_checkpoints_and_resumes(tiny_coco, tmp_path):
    ann_file, img_prefix = tiny_coco
    work_dir = str(tmp_path / "wd")
    cfg = _cfg(ann_file, img_prefix, work_dir)

    from oadg_tpu.engine.runner import EpochBasedRunner
    dataset = build_dataset(dict(cfg.data.train))
    loader = build_dataloader(dataset, samples_per_gpu=2, workers_per_gpu=1,
                              seed=0, static_hw=(64, 96), max_gt=8)
    det = build_detector(dict(cfg.model), num_views=1)
    runner = EpochBasedRunner(det, cfg, loader, work_dir, seed=0)
    losses0 = []
    orig_epoch = runner.train_epoch

    runner.run()
    assert runner.epoch == 2
    assert os.path.exists(os.path.join(work_dir, "checkpoints", "epoch_2"))
    # json log written
    log = [json.loads(l) for l in open(os.path.join(work_dir, "log.json"))
           if l.strip()]
    assert any(e.get("mode") == "train" for e in log)
    first_loss = log[0]["loss"]
    last_loss = log[-1]["loss"]
    assert np.isfinite(first_loss) and np.isfinite(last_loss)

    # resume restores epoch + params
    runner2 = EpochBasedRunner(det, cfg, loader, work_dir, seed=0)
    runner2.resume(auto=True)
    assert runner2.epoch == 2
    import jax
    p_old = jax.tree_util.tree_leaves(runner.params)[0]
    p_new = jax.tree_util.tree_leaves(runner2.params)[0]
    np.testing.assert_allclose(np.asarray(p_old), np.asarray(p_new),
                               rtol=1e-6)


@pytest.mark.slow
def test_runner_ema_lifecycle_e2e(tiny_coco, tmp_path):
    """EMAHook wired through the REAL runner: checkpoints at epoch end
    hold the EMA weights; training continues from the raw weights."""
    import jax
    ann, imgs = tiny_coco
    wd = str(tmp_path / "ema_run")
    cfg = _cfg(ann, imgs, wd)
    cfg.custom_hooks.append(dict(type='EMAHook', momentum=0.3, interval=1))
    dataset = build_dataset(cfg.data.train)
    loader = build_dataloader(dataset, 2, 1, shuffle=False, seed=0)
    det = build_detector(dict(cfg.model), num_views=1)
    from oadg_tpu.engine.runner import EpochBasedRunner
    runner = EpochBasedRunner(det, cfg, loader, wd, seed=0)
    ema_hooks = [h for h in runner.hooks if type(h).__name__ == 'EMAHook']
    assert ema_hooks, "EMAHook not built from custom_hooks"
    runner.run()
    hook = ema_hooks[0]
    # after_run leaves EMA weights swapped in for final eval/ckpt
    leaves_p = jax.tree_util.tree_leaves(runner.params)
    leaves_e = jax.tree_util.tree_leaves(hook.ema_params)
    assert len(leaves_p) == len(leaves_e)
    diff = sum(float(abs(np.asarray(a) - np.asarray(b)).sum())
               for a, b in zip(leaves_p, leaves_e))
    assert diff > 0, "EMA never diverged from raw params"
