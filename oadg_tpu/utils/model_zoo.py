"""Checkpoint spec resolution: model-zoo aliases + URL download cache.

Reference parity: mmcv's ``load_checkpoint`` resolves ``open-mmlab://``
and ``torchvision://`` prefixes through its bundled model-zoo json and
downloads http(s) URLs into a local cache (mmcv/runner/checkpoint.py,
open_mmlab.json). The DWD flagship recipe depends on this:
``/root/reference/configs/OA-DG/dwd/faster_rcnn_r101_dc5_1x_dwd.py:9-11``
inits the backbone from ``open-mmlab://detectron2/resnet101_caffe``.

The alias table below vendors the subset of mmcv's open_mmlab.json that
reference configs actually use (grep over /root/reference/configs). It
can be extended or overridden with a json file via the
``OADG_MODEL_ZOO`` env var ({alias: url} mapping).
"""
from __future__ import annotations

import json
import os
import urllib.request
from typing import Optional

# subset of mmcv open_mmlab.json + torchvision model_urls used by the
# reference configs (verbatim URLs from those tables)
OPEN_MMLAB_ZOO = {
    "detectron2/resnet50_caffe":
        "https://download.openmmlab.com/pretrain/third_party/"
        "resnet50_msra-5891d200.pth",
    "detectron2/resnet101_caffe":
        "https://download.openmmlab.com/pretrain/third_party/"
        "resnet101_msra-6cc46731.pth",
    "detectron2/resnext101_32x8d":
        "https://download.openmmlab.com/pretrain/third_party/"
        "resnext101_32x8d-1516f1aa.pth",
    "resnext101_32x4d":
        "https://download.openmmlab.com/pretrain/third_party/"
        "resnext101_32x4d-a5af3160.pth",
    "resnext101_64x4d":
        "https://download.openmmlab.com/pretrain/third_party/"
        "resnext101_64x4d-ee2c6f71.pth",
    "vgg16_caffe":
        "https://download.openmmlab.com/pretrain/third_party/"
        "vgg16_caffe-292e1171.pth",
    "darknet53":
        "https://download.openmmlab.com/pretrain/third_party/"
        "darknet53-a628ea1b.pth",
    "mmdet/mobilenet_v2":
        "https://download.openmmlab.com/mmdetection/v2.0/third_party/"
        "mobilenet_v2_batch256_imagenet-ff34753d.pth",
}

TORCHVISION_ZOO = {
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101":
        "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "resnet152":
        "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
}


def _cache_dir() -> str:
    d = os.environ.get(
        "OADG_CKPT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "oadg_tpu",
                     "checkpoints"))
    os.makedirs(d, exist_ok=True)
    return d


def _zoo_lookup(prefix: str, name: str) -> str:
    override = os.environ.get("OADG_MODEL_ZOO")
    if override and os.path.isfile(override):
        with open(override) as f:
            table = json.load(f)
        full = f"{prefix}://{name}"
        if full in table:
            return table[full]
        if name in table:
            return table[name]
    table = OPEN_MMLAB_ZOO if prefix == "open-mmlab" else TORCHVISION_ZOO
    if name not in table:
        raise KeyError(
            f"unknown model-zoo alias '{prefix}://{name}'. Known: "
            f"{sorted(table)}. Extend via OADG_MODEL_ZOO=<json file>.")
    return table[name]


def _download(url: str, dst: str) -> str:
    tmp = dst + ".part"
    try:
        with urllib.request.urlopen(url, timeout=120) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dst)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"failed to download checkpoint {url} -> {dst}: {e}. "
            f"If this host has no egress, download it elsewhere and place "
            f"it at {dst} (or point the config at a local path).") from e
    return dst


def resolve_checkpoint(spec: str,
                       cache_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint spec to a local file path.

    Accepts local paths (returned as-is), ``file://`` URLs,
    ``http(s)://`` URLs (downloaded into the cache dir keyed by
    basename; cache hits skip the download), and the mmcv-style
    ``open-mmlab://<alias>`` / ``torchvision://<name>`` aliases
    (resolved to their URL first).
    """
    if spec.startswith("open-mmlab://"):
        spec = _zoo_lookup("open-mmlab", spec[len("open-mmlab://"):])
    elif spec.startswith("torchvision://"):
        spec = _zoo_lookup("torchvision", spec[len("torchvision://"):])

    if spec.startswith("file://"):
        return spec[len("file://"):]
    if spec.startswith(("http://", "https://")):
        dst = os.path.join(cache_dir or _cache_dir(),
                           os.path.basename(spec.split("?")[0]))
        if os.path.isfile(dst):
            return dst
        return _download(spec, dst)
    return spec
