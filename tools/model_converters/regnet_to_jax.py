"""Convert pycls-pretrained RegNet checkpoints to this framework's tree.

Reference parity: tools/model_converters/regnet2mmdet.py — the same
pycls->torch key mapping (stem.conv->conv1, s{i}.b{j}.{proj,f.a..c}->
layer{i}.{j-1}.{downsample,conv1..3}), then through the repo's torch->jax
converter.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

_F_MAP = {"a": "conv1", "b": "conv2", "c": "conv3",
          "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}


def regnet_to_torch_keys(sd):
    out = {}
    for key, v in sd.items():
        if key.startswith("stem.conv"):
            out[key.replace("stem.conv", "conv1")] = v
        elif key.startswith("stem.bn"):
            out[key.replace("stem.bn", "bn1")] = v
        elif key.startswith("head.fc"):
            out[key.replace("head.fc", "fc")] = v
        elif key.startswith("s"):
            parts = key.split(".")
            layer, block, module = parts[:3]
            lname = f"layer{int(layer[1:])}"
            bname = str(int(block[1:]) - 1)
            tail = parts[-1]
            if int(block[1:]) == 1 and module == "bn":
                out[f"{lname}.{bname}.downsample.1.{tail}"] = v
            elif int(block[1:]) == 1 and module == "proj":
                out[f"{lname}.{bname}.downsample.0.{tail}"] = v
            elif module == "f":
                sub = _F_MAP.get(parts[3])
                if sub is None:
                    raise ValueError(f"unsupported pycls key {key}")
                out[f"{lname}.{bname}.{sub}.{tail}"] = v
            else:
                raise ValueError(f"unsupported pycls key {key}")
        # anything else (bn num_batches_tracked etc.) is dropped
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="pycls .pth checkpoint")
    p.add_argument("dst", help="output orbax directory")
    args = p.parse_args()

    import orbax.checkpoint as ocp
    from oadg_tpu.utils.checkpoint import (convert_torch_state_dict,
                                           load_torch_pth)
    ckpt = load_torch_pth(args.src)
    sd = ckpt.get("model_state", ckpt.get("state_dict", ckpt)) \
        if isinstance(ckpt, dict) else ckpt
    sd = regnet_to_torch_keys(sd)
    tree = convert_torch_state_dict(
        {f"backbone.{k}": v for k, v in sd.items() if not
         k.startswith("fc.")})
    ocp.PyTreeCheckpointer().save(osp.abspath(args.dst), tree, force=True)
    print(f"wrote {args.dst} ({len(sd)} torch keys)")


if __name__ == "__main__":
    main()
