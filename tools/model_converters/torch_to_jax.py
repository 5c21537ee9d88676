"""Convert a published mmdet torch checkpoint (.pth) to an Orbax tree this
framework loads directly (reference consumes these via ``load_from``)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help=".pth checkpoint")
    p.add_argument("dst", help="output orbax directory")
    args = p.parse_args()

    import orbax.checkpoint as ocp
    from oadg_tpu.utils.checkpoint import load_checkpoint_variables
    tree = load_checkpoint_variables(args.src)
    ocp.PyTreeCheckpointer().save(osp.abspath(args.dst), tree, force=True)
    n = sum(1 for _ in _leaves(tree))
    print(f"wrote {args.dst} ({n} arrays)")


def _leaves(t):
    for v in t.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        elif v is not None:
            yield v


if __name__ == "__main__":
    main()
