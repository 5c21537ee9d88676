"""WandbLogger behavior (reference core/hook/wandblogger_hook.py:17-678)
against an injected fake wandb module: train scalars, config upload, val
metrics, prediction table with box overlays, checkpoint artifacts."""
import sys
import types

import numpy as np
import pytest


class FakeRun:
    id = "fake"


class FakeTable:
    def __init__(self, columns):
        self.columns = columns
        self.rows = []

    def add_data(self, *row):
        self.rows.append(row)


class FakeImage:
    def __init__(self, path, boxes=None):
        self.path = path
        self.boxes = boxes


class FakeHistogram:
    def __init__(self, data):
        self.data = np.asarray(data)


class FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.dirs = []

    def add_dir(self, d):
        self.dirs.append(d)


def make_fake_wandb():
    m = types.ModuleType("wandb")
    m.logged = []
    m.inited = []
    m.artifacts = []
    m.run = FakeRun()
    m.config = types.SimpleNamespace(update=lambda *a, **k: None)
    m.init = lambda **kw: m.inited.append(kw)
    m.log = lambda data, step=None: m.logged.append((data, step))
    m.finish = lambda: m.logged.append(("FINISH", None))
    m.Table = FakeTable
    m.Image = FakeImage
    m.Histogram = FakeHistogram
    m.Artifact = FakeArtifact
    m.log_artifact = lambda a: m.artifacts.append(a)
    return m


class FakeLogger:
    def warning(self, *a):
        pass

    info = warning


class FakeCkpt:
    def __init__(self, path):
        self._p = path

    def latest_path(self):
        return self._p


class FakeDS:
    CLASSES = ("person", "car")
    img_prefix = "/imgs"
    data_infos = [dict(filename="a.png"), dict(filename="b.png")]

    def __len__(self):
        return 2


@pytest.fixture
def fake_wandb(monkeypatch):
    m = make_fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", m)
    return m


def _make_hook(fake_wandb, **kw):
    # force re-import binding to the fake module
    from oadg_tpu.core.hook.hooks import WandbLogger
    h = WandbLogger(**kw)
    h.wandb = fake_wandb
    return h


def test_wandb_train_and_val_logging(fake_wandb, tmp_path):
    h = _make_hook(fake_wandb, interval=1, log_checkpoint=True,
                   num_eval_images=2, bbox_score_thr=0.5)
    runner = types.SimpleNamespace(
        logger=FakeLogger(), iter=10, epoch=1, cfg=dict(a=1),
        lr_fn=lambda it: 0.02, hooks=[],
        ckpt=FakeCkpt(str(tmp_path)),
        val_dataset=FakeDS(),
        last_val_results=[
            [np.array([[1, 2, 3, 4, 0.9]]), np.zeros((0, 5))],
            [np.zeros((0, 5)), np.array([[5, 6, 7, 8, 0.2]])],
        ])
    h.before_run(runner)
    assert fake_wandb.inited

    h.after_train_iter(runner, dict(loss=1.5, acc=90.0))
    data, step = fake_wandb.logged[-1]
    assert data["train/loss"] == 1.5 and data["train/acc"] == 90.0
    assert data["learning_rate"] == 0.02 and step == 10

    h.after_train_epoch(runner)
    assert fake_wandb.artifacts and fake_wandb.artifacts[0].dirs == [str(tmp_path)]

    h.after_val_epoch(runner, dict(bbox_mAP=0.5, bbox_mAP_50=0.7))
    val_log = [d for d, _ in fake_wandb.logged if "val/bbox_mAP" in d]
    assert val_log and val_log[0]["val/bbox_mAP"] == 0.5
    tables = [d["eval/predictions"] for d, _ in fake_wandb.logged
              if "eval/predictions" in d]
    assert tables
    t = tables[0]
    assert len(t.rows) == 2
    img_a = t.rows[0][1]
    assert img_a.path.endswith("a.png")
    # the 0.9-score det survives the 0.5 threshold; the 0.2 one is dropped
    assert len(img_a.boxes["predictions"]["box_data"]) == 1
    img_b = t.rows[1][1]
    assert len(img_b.boxes["predictions"]["box_data"]) == 0
    assert img_a.boxes["predictions"]["class_labels"] == {0: "person",
                                                          1: "car"}

    h.after_run(runner)
    assert ("FINISH", None) in fake_wandb.logged


def test_wandb_multi_domain_prefix(fake_wandb):
    from oadg_tpu.core.hook.hooks import WandbLoggerMulti
    h = WandbLoggerMulti(num_eval_images=0)
    h.wandb = fake_wandb
    runner = types.SimpleNamespace(logger=FakeLogger(), iter=5,
                                   val_domain="night_sunny",
                                   val_dataset=None, last_val_results=None)
    h.after_val_epoch(runner, dict(mAP=0.3))
    data, _ = fake_wandb.logged[-1]
    assert data["val/night_sunny/mAP"] == 0.3


def test_wandb_noop_without_package():
    from oadg_tpu.core.hook.hooks import WandbLogger
    h = WandbLogger()
    h.wandb = None
    runner = types.SimpleNamespace(logger=FakeLogger())
    h.before_run(runner)
    h.after_train_iter(runner, dict(loss=1.0))
    h.after_val_epoch(runner, dict(m=1.0))
    h.after_run(runner)
