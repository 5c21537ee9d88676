"""Debug/analysis visualization helpers (torch-free rewrite of reference
mmdet/utils/visualize.py:15-457).

The reference module backs the wandb logging hooks and ad-hoc debugging:
score histograms over proposals, score-density overlays on the source
image, t-SNE embeddings of contrastive features, confusion-matrix and
bar plots. Everything here takes numpy (or anything ``np.asarray``
accepts — jax arrays included) and uses the non-interactive Agg backend
so it is safe inside training jobs and tests.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt                              # noqa: E402
from matplotlib.patches import Rectangle                     # noqa: E402

# reference visualize.py:46-48
COLOR_CODE = ["#FF5A5A", "#DC9146", "#FFCD28", "#FAFAA0", "#CBFF75",
              "#AFFFEE", "#87F5F5", "#5AD2FF", "#A390EE"]
EDGE_COLOR_CODE = ["#CD0000", "#8B4513", "#FF8200", "#FFC81E", "#64CD3C",
                   "#66CDAA", "#20B2AA", "#0000FF", "#6A5ACD"]
EPS = 1e-2

dirname = ""        # module-level save prefix, kept for API parity


def _np(x) -> np.ndarray:
    """Coerce torch-free: accepts numpy / jax / lists."""
    return np.asarray(x)


def imsave(image, title: Optional[str] = None, save: Optional[str] = None):
    """Show one (grayscale) image; optionally save under ``dirname``
    (reference visualize.py:15)."""
    plt.imshow(_np(image), cmap="gray")
    if title:
        plt.title(title)
    if save:
        plt.savefig(f"{dirname}/{save}.png" if dirname else f"{save}.png")


def bincount(data, num_bins: int) -> np.ndarray:
    """Histogram counts over [min, max] (reference visualize.py:23
    torch.histc analog)."""
    data = _np(data).reshape(-1).astype(np.float64)
    if data.size == 0:
        return np.zeros(num_bins)
    counts, _ = np.histogram(data, bins=num_bins,
                             range=(float(data.min()), float(data.max())))
    return counts.astype(np.float64)


def multi_imsave(image, rows: int, cols: int, save: Optional[str] = None):
    """Grid of per-channel images, each titled with its 2-bin histogram
    (reference visualize.py:31)."""
    plt.figure(figsize=(14, 10))
    i = 0
    for row in range(rows):
        for col in range(cols):
            is_last = (row == rows - 1) and (col == cols - 1)
            plt.subplot(rows, cols, i + 1)
            count = bincount(_np(image[i]).reshape(-1), 2)
            imsave(_np(image[i]), title=np.array2string(count, precision=3),
                   save=save if is_last else None)
            i += 1


def get_file_name(debug_cfg: Dict[str, Any], name: str,
                  extension: str = "png",
                  img_meta: Optional[Dict[str, Any]] = None) -> str:
    """Resolve (and create) the output path for a named debug artifact
    (reference visualize.py:53)."""
    out_dir = debug_cfg["out_dir"]
    if img_meta:
        stem = img_meta["ori_filename"].split(".png")[0]
        name = f"{stem}_{name}"
    sub = os.path.join(out_dir, name.split("/")[0])
    os.makedirs(sub, exist_ok=True)
    return f"{out_dir}/{name}.{extension}"


def _score_hist(scores, name, img_meta, debug_cfg, bins, alpha):
    scores = _np(scores).astype(np.float64)
    if scores.ndim == 1:
        scores = scores[:, None]
    if scores.shape[-1] != 1:
        raise ValueError(
            f"The input scores should be shaped as (N, 1), got {scores.shape}")
    flat = scores.reshape(-1)
    if flat.size == 0:          # reference swallows the empty case
        plt.close()
        return
    counts, edges, bars = plt.hist(flat, bins=bins, alpha=alpha)
    try:
        plt.bar_label(bars)
    except Exception:           # pragma: no cover - old matplotlib
        pass
    plt.xlim(0.0, 1.0)
    plt.title(f"range=({flat.min():.2f},{flat.max():.2f})")
    if debug_cfg and (name in debug_cfg.get("save_list", ())):
        plt.savefig(get_file_name(debug_cfg, name, img_meta=img_meta))
    plt.close()


def visualize_score_distribution(scores, name: str,
                                 img_meta: Optional[Dict] = None,
                                 debug_cfg: Optional[Dict] = None,
                                 bins: int = 100, alpha: float = 1):
    """Histogram of proposal/detection scores (reference visualize.py:67)."""
    _score_hist(scores, name, img_meta, debug_cfg, bins, alpha)


def visualize_score_distribution_stacked(scores, name: str,
                                         img_meta: Optional[Dict] = None,
                                         debug_cfg: Optional[Dict] = None,
                                         bins: int = 100, alpha: float = 1):
    """Alpha-stacked variant (reference visualize.py:102 — identical math,
    kept as a separate entry point for API parity)."""
    _score_hist(scores, name, img_meta, debug_cfg, bins, alpha)


def _load_image(img_meta: Dict[str, Any]) -> np.ndarray:
    """Read the source image named by img_meta as float RGB in [0, 1]."""
    import cv2
    img = cv2.imread(img_meta["filename"], cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(img_meta["filename"])
    return img[..., ::-1].astype(np.float32) / 255.0


def visualize_score_density(fives, name: str, topk: Optional[int] = None,
                            save_original: bool = False,
                            img_meta: Optional[Dict] = None,
                            debug_cfg: Optional[Dict] = None,
                            win_name: str = ""):
    """Overlay score-alpha'd boxes on the source image
    (reference visualize.py:137).

    ``fives`` is an (N, 5) array [x1, y1, x2, y2, score] or a per-class
    list of such arrays (bbox_result format); per-class overlays use
    COLOR_CODE and gt annotations (debug_cfg['annotations']) draw as
    edge-only rectangles.
    """
    img = _load_image(img_meta)
    fig = plt.figure(win_name)
    dpi = fig.get_dpi()
    height, width = img_meta["ori_shape"][0], img_meta["ori_shape"][1]
    fig.set_size_inches((width + EPS) / dpi, (height + EPS) / dpi)
    plt.subplots_adjust(left=0, right=1, bottom=0, top=1)
    ax = plt.gca()
    ax.axis("off")
    plt.imshow(img)
    if save_original and debug_cfg:
        plt.savefig(get_file_name(debug_cfg, f"{name}_original",
                                  img_meta=img_meta))

    def _add(row, facecolor, edgecolor=None):
        x1, y1, x2, y2 = (float(v) for v in row[:4])
        alpha = float(np.clip(row[4], 0.0, 1.0)) if len(row) > 4 else None
        if edgecolor is not None:
            patch = Rectangle((int(x1), int(y1)), int(x2 - x1), int(y2 - y1),
                              edgecolor=edgecolor, facecolor="none")
        else:
            patch = Rectangle((int(x1), int(y1)), int(x2 - x1), int(y2 - y1),
                              facecolor=facecolor, alpha=alpha)
        ax.add_patch(patch)

    if isinstance(fives, (list, tuple)):
        for c, cls_rows in enumerate(fives):
            for row in _np(cls_rows):
                _add(row, COLOR_CODE[c % len(COLOR_CODE)])
        ann = (debug_cfg or {}).get("annotations")
        if ann is not None:
            labels = _np(ann["labels"]).astype(int)
            boxes = _np(ann["bboxes"])
            for i in range(len(labels)):
                _add(boxes[i], None,
                     edgecolor=EDGE_COLOR_CODE[labels[i] % len(EDGE_COLOR_CODE)])
    else:
        rows = _np(fives)
        if topk:
            rows = rows[np.argsort(-rows[:, 4])][:topk + 1]
        for row in rows:
            _add(row, "red")

    if debug_cfg and (name in debug_cfg.get("save_list", ())):
        plt.savefig(get_file_name(debug_cfg, name, img_meta=img_meta))
    plt.close()


def visualize_image(img_meta: Dict, name: str,
                    debug_cfg: Optional[Dict] = None, win_name: str = ""):
    """Save the raw source image at native resolution
    (reference visualize.py:211)."""
    img = _load_image(img_meta)
    fig = plt.figure(win_name)
    dpi = fig.get_dpi()
    height, width = img_meta["ori_shape"][0], img_meta["ori_shape"][1]
    fig.set_size_inches((width + EPS) / dpi, (height + EPS) / dpi)
    plt.subplots_adjust(left=0, right=1, bottom=0, top=1)
    plt.gca().axis("off")
    plt.imshow(img)
    if debug_cfg and name in debug_cfg.get("save_list", ()):
        plt.savefig(get_file_name(debug_cfg, name, img_meta=img_meta))
    plt.close()


def _tsne_embed(features: np.ndarray) -> np.ndarray:
    """2-D t-SNE embedding; PCA fallback when sklearn is unavailable."""
    try:
        from sklearn.manifold import TSNE
        n = len(features)
        tsne = TSNE(n_components=2, perplexity=min(10, max(2, n - 1)),
                    learning_rate=200.0, init="random")
        return tsne.fit_transform(features)
    except ImportError:                              # pragma: no cover
        x = features - features.mean(0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        return x @ vt[:2].T


def plot_tsne(test_features, targets=None, title: Optional[str] = None,
              save: Optional[str] = None):
    """Scatter a 2-D t-SNE of contrastive features colored by class
    (reference visualize.py:245)."""
    feats = _np(test_features).astype(np.float64)
    y = _np(targets) if targets is not None else None
    emb = _tsne_embed(feats)
    plt.figure(figsize=(12, 12))
    plt.scatter(emb[:, 0], emb[:, 1], marker=".", cmap="Paired", c=y)
    if title is not None:
        plt.title(f"t-SNE ({title})", weight="bold").set_fontsize("14")
    plt.xlabel("x", weight="bold").set_fontsize("10")
    plt.ylabel("y", weight="bold").set_fontsize("10")
    plt.axis("equal")
    if save is not None:
        plt.savefig(save)
    return plt


def single_plot_tsne(test_features, targets=None, title=None, save=None):
    """Single-panel variant (reference visualize.py:265)."""
    return plot_tsne(test_features, targets=targets, title=title, save=save)


def multi_plot_tsne(test_features_list: Sequence, targets_list=None,
                    title_list=None, rows: int = 1, cols: int = 1,
                    save: Optional[str] = None):
    """Grid of t-SNE panels, one per feature set
    (reference visualize.py:314)."""
    plt.figure(figsize=(12 * cols, 12 * rows))
    for i, feats in enumerate(test_features_list):
        plt.subplot(rows, cols, i + 1)
        emb = _tsne_embed(_np(feats).astype(np.float64))
        y = _np(targets_list[i]) if targets_list is not None else None
        plt.scatter(emb[:, 0], emb[:, 1], marker=".", cmap="Paired", c=y)
        if title_list is not None:
            plt.title(f"t-SNE ({title_list[i]})", weight="bold")
        plt.axis("equal")
    if save is not None:
        plt.savefig(save)
    return plt


_CITYSCAPES_MATRIX_CLASSES = ["person", "rider", "car", "truck", "bus",
                              "train", "motorcycle", "bicycle", "background"]


def plot_matrix(cm, dataset: str = "cityscapes", classes: int = 0,
                normalize: str = "None", txt: bool = True,
                title: str = "Matrix", cmap=None):
    """Confusion-matrix heatmap with optional axis normalization
    (reference visualize.py:344)."""
    cm = _np(cm).astype(np.float64)
    if classes != 0:
        class_names: List = list(range(classes))
    elif dataset == "cityscapes":
        class_names = list(_CITYSCAPES_MATRIX_CLASSES)
    else:
        class_names = list(range(cm.shape[0]))
    plt.figure(figsize=(max(4, len(class_names)), max(4, len(class_names))))
    if normalize == "x":
        cm = cm / (cm.sum(axis=0)[:, None] + 1e-8)
    elif normalize == "y":
        cm = cm / (cm.sum(axis=1)[None, :] + 1e-8)
    elif normalize == "xy":
        cm = cm / (cm.sum() + 1e-8)
    plt.imshow(cm, interpolation="nearest",
               cmap=cmap if cmap is not None else plt.cm.Blues)
    plt.title(title)
    plt.colorbar()
    ticks = np.arange(len(class_names))
    plt.xticks(ticks, class_names, rotation=45)
    plt.yticks(ticks, class_names)
    if txt:
        thresh = cm.max() / 2.0
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                plt.text(j, i, format(cm[i, j], ".2f"),
                         horizontalalignment="center",
                         color="white" if cm[i, j] > thresh else "black")
    plt.tight_layout()
    plt.ylabel("anchor class")
    plt.xlabel("Contrast class")
    return plt


def plot_bar(feature, normalize: str = "None", txt: bool = True,
             title: str = "1D plot feature"):
    """Bar plot of a 1-D feature vector (reference visualize.py:407)."""
    feature = _np(feature).reshape(-1)
    plt.figure()
    plt.bar(np.arange(feature.shape[0]), height=feature)
    plt.title(title)
    plt.tight_layout()
    plt.ylabel("value")
    plt.xlabel("feature dim")
    return plt
