"""Checkpoint alias/URL resolution + foreign-weight converters.

Reference parity: mmcv load_checkpoint's open-mmlab:// / torchvision://
model-zoo resolution + download cache (used by the DWD flagship recipe,
configs/OA-DG/dwd/faster_rcnn_r101_dc5_1x_dwd.py:9-11) and
tools/model_converters/{detectron2pytorch,regnet2mmdet,selfsup2mmdet}.py.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools",
    "model_converters"))


# ---------------- resolve_checkpoint ----------------

def test_resolver_local_and_file_url(tmp_path):
    from oadg_tpu.utils.model_zoo import resolve_checkpoint
    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    assert resolve_checkpoint(str(p)) == str(p)
    assert resolve_checkpoint("file://" + str(p)) == str(p)


def test_resolver_alias_via_override_table(tmp_path, monkeypatch):
    """open-mmlab:// alias -> URL -> local file, with no network: the
    override table maps the alias to a file:// URL."""
    from oadg_tpu.utils.model_zoo import resolve_checkpoint
    ck = tmp_path / "resnet101_msra.pth"
    ck.write_bytes(b"weights")
    table = {"open-mmlab://detectron2/resnet101_caffe": "file://" + str(ck)}
    zoo = tmp_path / "zoo.json"
    zoo.write_text(json.dumps(table))
    monkeypatch.setenv("OADG_MODEL_ZOO", str(zoo))
    got = resolve_checkpoint("open-mmlab://detectron2/resnet101_caffe")
    assert got == str(ck)


def test_resolver_url_cache_hit(tmp_path, monkeypatch):
    """An https URL whose basename already sits in the cache dir is
    returned without any network access."""
    from oadg_tpu.utils.model_zoo import resolve_checkpoint
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "resnet101_msra-6cc46731.pth").write_bytes(b"cached")
    monkeypatch.setenv("OADG_CKPT_CACHE", str(cache))
    got = resolve_checkpoint("open-mmlab://detectron2/resnet101_caffe")
    assert got == str(cache / "resnet101_msra-6cc46731.pth")


def test_resolver_unknown_alias_raises():
    from oadg_tpu.utils.model_zoo import resolve_checkpoint
    with pytest.raises(KeyError, match="no_such_model"):
        resolve_checkpoint("open-mmlab://no_such_model")


# ---------------- bare-backbone .pth loading ----------------

def test_bare_backbone_pth_maps_to_backbone_tree(tmp_path):
    """A classification checkpoint (conv1./layer1. keys, no detector
    section prefix — what the model-zoo URLs serve) loads into the
    backbone subtree, mirroring mmcv Pretrained-init semantics."""
    torch = pytest.importorskip("torch")
    from oadg_tpu.utils.checkpoint import load_checkpoint_variables
    rng = np.random.RandomState(0)
    sd = {
        "conv1.weight": rng.randn(16, 3, 7, 7).astype(np.float32),
        "bn1.weight": np.ones(16, np.float32),
        "bn1.bias": np.zeros(16, np.float32),
        "bn1.running_mean": np.zeros(16, np.float32),
        "bn1.running_var": np.ones(16, np.float32),
        "fc.weight": rng.randn(10, 16).astype(np.float32),  # dropped
        "fc.bias": np.zeros(10, np.float32),
    }
    path = str(tmp_path / "cls.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    tree = load_checkpoint_variables(path)
    w = np.asarray(tree["params"]["backbone_m"]["conv1"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        w, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))


# ---------------- merge_variables ----------------

def test_merge_variables_backbone_only():
    """Partial (backbone-only) Pretrained merge: loaded leaves graft on,
    unmatched init leaves stay (the semantics the apis/train.py
    init_cfg=Pretrained path relies on)."""
    from oadg_tpu.utils.checkpoint import merge_variables
    dst = {"params": {
        "backbone_m": {"conv1": {"kernel": np.zeros(3, np.float32)}},
        "neck": {"lateral": np.ones(2, np.float32)}}}
    src = {"params": {
        "backbone_m": {"conv1": {"kernel": np.full(3, 7.0, np.float32)}}}}
    out = merge_variables(dst, src)
    np.testing.assert_array_equal(
        out["params"]["backbone_m"]["conv1"]["kernel"], np.full(3, 7.0))
    np.testing.assert_array_equal(out["params"]["neck"]["lateral"],
                                  np.ones(2))


# ---------------- detectron2 caffe2-pkl converter ----------------

def _fake_caffe2_r50_blobs():
    rng = np.random.RandomState(1)
    blobs = {"conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
             "res_conv1_bn_s": np.ones(64, np.float32),
             "res_conv1_bn_b": np.zeros(64, np.float32)}
    arch = (3, 4, 6, 3)
    chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024),
             (1024, 512, 2048)]
    for i, n in enumerate(arch, start=1):
        cin, mid, cout = chans[i - 1]
        for j in range(n):
            bi = cin if j == 0 else cout
            if j == 0:
                blobs[f"res{i + 1}_{j}_branch1_w"] = \
                    rng.randn(cout, bi, 1, 1).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_s"] = \
                    np.ones(cout, np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_b"] = \
                    np.zeros(cout, np.float32)
            shapes = [(mid, bi, 1), (mid, mid, 3), (cout, mid, 1)]
            for (co, ci, k), letter in zip(shapes, "abc"):
                blobs[f"res{i + 1}_{j}_branch2{letter}_w"] = \
                    rng.randn(co, ci, k, k).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_s"] = \
                    np.ones(co, np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_b"] = \
                    np.zeros(co, np.float32)
    return blobs


def test_detectron2_blob_mapping(tmp_path):
    import pickle
    from detectron2_to_jax import (caffe2_blobs_to_torch_keys,
                                   load_caffe2_pickle)
    blobs = _fake_caffe2_r50_blobs()
    src = tmp_path / "model_final.pkl"
    with open(src, "wb") as f:
        pickle.dump({"blobs": blobs}, f, protocol=2)
    loaded = load_caffe2_pickle(str(src))
    sd = caffe2_blobs_to_torch_keys(loaded, 50)
    np.testing.assert_array_equal(sd["conv1.weight"], blobs["conv1_w"])
    # affine-channel BN: scale->weight, synth unit running stats
    np.testing.assert_array_equal(sd["bn1.weight"],
                                  blobs["res_conv1_bn_s"])
    np.testing.assert_array_equal(sd["bn1.running_var"], np.ones(64))
    assert "layer1.0.downsample.0.weight" in sd
    assert "layer4.2.conv3.weight" in sd
    # through the torch->jax converter into the backbone tree
    from oadg_tpu.utils.checkpoint import convert_torch_state_dict
    tree = convert_torch_state_dict(
        {f"backbone.{k}": v for k, v in sd.items()})
    w = np.asarray(tree["params"]["backbone_m"]["conv1"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        w, np.transpose(blobs["conv1_w"], (2, 3, 1, 0)))


def test_caffe2_unpickler_blocks_non_numpy(tmp_path):
    import pickle
    from detectron2_to_jax import load_caffe2_pickle

    src = tmp_path / "evil.pkl"
    with open(src, "wb") as f:
        pickle.dump({"blobs": os.getcwd}, f)   # a non-numpy global ref
    with pytest.raises(Exception, match="blocked|global"):
        load_caffe2_pickle(str(src))


# ---------------- regnet / selfsup key mapping ----------------

def test_regnet_key_mapping():
    from regnet_to_jax import regnet_to_torch_keys
    sd = {"stem.conv.weight": 1, "stem.bn.weight": 2, "stem.bn.bias": 3,
          "s1.b1.proj.weight": 4, "s1.b1.bn.weight": 5,
          "s1.b1.f.a.weight": 6, "s1.b1.f.a_bn.weight": 7,
          "s2.b3.f.c.weight": 8, "head.fc.weight": 9}
    out = regnet_to_torch_keys(sd)
    assert out["conv1.weight"] == 1
    assert out["bn1.weight"] == 2
    assert out["layer1.0.downsample.0.weight"] == 4
    assert out["layer1.0.downsample.1.weight"] == 5
    assert out["layer1.0.conv1.weight"] == 6
    assert out["layer1.0.bn1.weight"] == 7
    assert out["layer2.2.conv3.weight"] == 8
    assert out["fc.weight"] == 9


def test_selfsup_key_mapping():
    from selfsup_to_jax import selfsup_to_torch_keys
    moco = {"module.encoder_q.conv1.weight": 1,
            "module.encoder_q.fc.0.weight": 2,     # projection head
            "module.encoder_k.conv1.weight": 3}
    out = selfsup_to_torch_keys(moco, "moco")
    assert out == {"conv1.weight": 1}
    swav = {"module.conv1.weight": 4, "module.projection_head.w": 5}
    out = selfsup_to_torch_keys(swav, "swav")
    assert out == {"conv1.weight": 4}
