"""Tests for oadg_tpu/utils/visualize.py (analog of reference
mmdet/utils/visualize.py debug-plot helpers)."""
import os

import numpy as np
import pytest

from oadg_tpu.utils import visualize as V


def test_bincount_matches_histogram():
    data = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    c = V.bincount(data, 2)
    assert c.sum() == 5
    assert c.tolist() == [2, 3]
    assert V.bincount(np.zeros(0), 4).tolist() == [0, 0, 0, 0]


def test_score_distribution_saves_file(tmp_path):
    scores = np.random.RandomState(0).rand(50)
    cfg = {"out_dir": str(tmp_path), "save_list": ["props"]}
    V.visualize_score_distribution(scores, "props", debug_cfg=cfg)
    assert os.path.exists(tmp_path / "props.png")
    # empty input is swallowed like the reference
    V.visualize_score_distribution(np.zeros((0,)), "props", debug_cfg=cfg)
    # shape validation
    with pytest.raises(ValueError):
        V.visualize_score_distribution(np.zeros((4, 2)), "props")


def test_score_density_and_image(tmp_path):
    import cv2
    img_file = str(tmp_path / "src.png")
    cv2.imwrite(img_file, np.random.RandomState(1).randint(
        0, 255, (60, 80, 3)).astype(np.uint8))
    meta = {"filename": img_file, "ori_filename": "src.png",
            "ori_shape": (60, 80, 3)}
    cfg = {"out_dir": str(tmp_path), "save_list": ["density", "raw"],
           "annotations": {"labels": np.array([0, 1]),
                           "bboxes": np.array([[1, 1, 10, 10],
                                               [20, 20, 40, 40]], float)}}
    fives = np.array([[5, 5, 25, 25, 0.9], [30, 10, 60, 50, 0.4]], float)
    V.visualize_score_density(fives, "density", topk=1, img_meta=meta,
                              debug_cfg=cfg)
    assert os.path.exists(tmp_path / "src_density.png")
    # per-class list form with gt overlays
    V.visualize_score_density([fives[:1], fives[1:]], "density",
                              img_meta=meta, debug_cfg=cfg)
    V.visualize_image(meta, "raw", debug_cfg=cfg)
    assert os.path.exists(tmp_path / "src_raw.png")


def test_plot_tsne_and_matrix(tmp_path):
    feats = np.random.RandomState(2).randn(24, 8)
    y = np.repeat(np.arange(4), 6)
    out = str(tmp_path / "tsne.png")
    V.plot_tsne(feats, y, title="cont", save=out)
    assert os.path.exists(out)
    V.multi_plot_tsne([feats[:12], feats[12:]], [y[:12], y[12:]],
                      ["a", "b"], rows=1, cols=2,
                      save=str(tmp_path / "multi.png"))
    assert os.path.exists(tmp_path / "multi.png")

    cm = np.random.RandomState(3).rand(9, 9)
    p = V.plot_matrix(cm, dataset="cityscapes", normalize="x")
    assert p is not None
    p = V.plot_matrix(cm[:4, :4], classes=4, normalize="xy")
    assert p is not None
    p = V.plot_bar(np.arange(16, dtype=float))
    assert p is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_multi_imsave(tmp_path):
    V.dirname = str(tmp_path)
    try:
        img = np.random.RandomState(4).rand(4, 8, 8)
        V.multi_imsave(img, 2, 2, save="grid")
        assert os.path.exists(tmp_path / "grid.png")
    finally:
        V.dirname = ""
    import matplotlib.pyplot as plt
    plt.close("all")
