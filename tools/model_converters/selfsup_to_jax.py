"""Convert self-supervised (MoCo / SwAV) pretrained backbones to this
framework's checkpoint tree.

Reference parity: tools/model_converters/selfsup2mmdet.py — MoCo keys are
``module.encoder_q.<resnet key>`` (strip the prefix, drop the projection
head); SwAV checkpoints already use plain resnet keys.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def selfsup_to_torch_keys(sd, kind: str):
    out = {}
    for k, v in sd.items():
        if kind == "moco":
            if not k.startswith("module.encoder_q."):
                continue
            k = k[len("module.encoder_q."):]
        elif k.startswith("module."):
            k = k[len("module."):]
        if k.startswith(("fc.", "head.", "projection")):
            continue
        out[k] = v
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="self-sup .pth checkpoint")
    p.add_argument("dst", help="output orbax directory")
    p.add_argument("--selfsup", choices=["moco", "swav"], required=True)
    args = p.parse_args()

    import orbax.checkpoint as ocp
    from oadg_tpu.utils.checkpoint import (convert_torch_state_dict,
                                           load_torch_pth)
    ckpt = load_torch_pth(args.src)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = selfsup_to_torch_keys(sd, args.selfsup)
    tree = convert_torch_state_dict(
        {f"backbone.{k}": v for k, v in sd.items()})
    ocp.PyTreeCheckpointer().save(osp.abspath(args.dst), tree, force=True)
    print(f"wrote {args.dst} ({len(sd)} torch keys)")


if __name__ == "__main__":
    main()
