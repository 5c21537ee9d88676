"""Convert a detectron/detectron2 caffe2-pickle ResNet backbone to this
framework's checkpoint tree.

Reference parity: tools/model_converters/detectron2pytorch.py — the same
caffe2 blob-name mapping (conv1/res_conv1_bn, res{i}_{j}_branch{1,2a..c})
to torch ResNet keys (conv1/bn1, layer{i}.{j}.conv{k}/bn{k}/downsample),
then through the repo's torch->jax key converter. Detectron replaces BN
with affine channels, so running stats are synthesized as zero-mean /
unit-var (matching the reference converter).

Torch-free: the caffe2 pickle holds plain numpy arrays (latin1-pickled);
a restricted unpickler admits only numpy/builtins.
"""
import argparse
import io
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class _NumpyUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] in ("numpy", "collections", "builtins",
                                    "_codecs"):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (numpy-only reader)")


def load_caffe2_pickle(path):
    with open(path, "rb") as f:
        data = f.read()
    u = _NumpyUnpickler(io.BytesIO(data), encoding="latin1")
    obj = u.load()
    return obj.get("blobs", obj) if isinstance(obj, dict) else obj


def caffe2_blobs_to_torch_keys(blobs, depth: int):
    """caffe2 blob names -> torch-style ResNet state_dict (numpy)."""
    if depth not in ARCH:
        raise ValueError(f"only ResNet-50/101 supported, got {depth}")
    sd = {}

    def conv(cname, tname):
        sd[tname + ".weight"] = np.asarray(blobs[cname + "_w"])
        if cname + "_b" in blobs:
            sd[tname + ".bias"] = np.asarray(blobs[cname + "_b"])

    def bn(cname, tname):
        w = np.asarray(blobs[cname + "_s"])
        sd[tname + ".weight"] = w
        sd[tname + ".bias"] = np.asarray(blobs[cname + "_b"])
        sd[tname + ".running_mean"] = np.zeros_like(w)
        sd[tname + ".running_var"] = np.ones_like(w)

    conv("conv1", "conv1")
    bn("res_conv1_bn", "bn1")
    for i, nblocks in enumerate(ARCH[depth], start=1):
        for j in range(nblocks):
            if j == 0:
                conv(f"res{i + 1}_{j}_branch1",
                     f"layer{i}.{j}.downsample.0")
                bn(f"res{i + 1}_{j}_branch1_bn",
                   f"layer{i}.{j}.downsample.1")
            for k, letter in enumerate(["a", "b", "c"]):
                conv(f"res{i + 1}_{j}_branch2{letter}",
                     f"layer{i}.{j}.conv{k + 1}")
                bn(f"res{i + 1}_{j}_branch2{letter}_bn",
                   f"layer{i}.{j}.bn{k + 1}")
    return sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="detectron caffe2 .pkl")
    p.add_argument("dst", help="output orbax directory")
    p.add_argument("depth", type=int, choices=[50, 101])
    args = p.parse_args()

    import orbax.checkpoint as ocp
    from oadg_tpu.utils.checkpoint import convert_torch_state_dict
    blobs = load_caffe2_pickle(args.src)
    sd = caffe2_blobs_to_torch_keys(blobs, args.depth)
    tree = convert_torch_state_dict(
        {f"backbone.{k}": v for k, v in sd.items()})
    ocp.PyTreeCheckpointer().save(osp.abspath(args.dst), tree, force=True)
    print(f"wrote {args.dst} ({len(sd)} torch keys)")


if __name__ == "__main__":
    main()
