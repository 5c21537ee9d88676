"""Dump OA-Mix augmented views for visual inspection (device kernels).

Runs the on-device OA-Mix on an image (+ optional boxes) and writes the
clean view, augmented views, and the random-box overlays.
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img", help="image path")
    p.add_argument("--out-dir", default="oamix_vis")
    p.add_argument("--num-views", type=int, default=3)
    p.add_argument("--version", default="augmix",
                   choices=["augmix", "augmix.all"])
    p.add_argument("--boxes", nargs="+", type=float, default=None,
                   help="x1 y1 x2 y2 [x1 y1 x2 y2 ...] gt boxes")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from oadg_tpu.ops.oamix_device import oamix_batch
    from oadg_tpu.core.visualization import imshow_det_bboxes

    img = cv2.imread(args.img)
    h, w = img.shape[:2]
    if args.boxes:
        boxes = np.asarray(args.boxes, np.float32).reshape(-1, 4)
    else:
        boxes = np.asarray([[w * .1, h * .3, w * .35, h * .8],
                            [w * .6, h * .4, w * .85, h * .9]], np.float32)
    g = len(boxes)
    cfg = dict(version=args.version, num_views=args.num_views, severity=10,
               mixture_width=3, mixture_depth=-1,
               random_box_scale=(0.01, 0.1), random_box_ratio=(3, 1 / 3),
               oa_random_box_scale=(0.005, 0.1),
               oa_random_box_ratio=(3, 1 / 3), spatial_ratio=4,
               sigma_ratio=0.3)
    out = oamix_batch(
        jnp.asarray(img[None].astype(np.float32)),
        jnp.asarray(boxes[None]), jnp.ones((1, g), bool),
        jnp.asarray([[h, w]], jnp.float32),
        jax.random.PRNGKey(args.seed), cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    cv2.imwrite(osp.join(args.out_dir, "view1_clean.png"), img)
    aug = np.asarray(out["aug"][0]).astype(np.uint8)
    for v in range(aug.shape[0]):
        cv2.imwrite(osp.join(args.out_dir, f"view{v + 2}_aug.png"), aug[v])
    ml = np.asarray(out["multilevel_boxes"][0])
    mlv = np.asarray(out["multilevel_valid"][0])
    oa = np.asarray(out["oamix_boxes"][0])
    oav = np.asarray(out["oamix_valid"][0])
    overlay = imshow_det_bboxes(
        aug[-1], np.concatenate([boxes, ml[mlv], oa[oav]]),
        np.concatenate([np.zeros(g, int), np.ones(int(mlv.sum()), int),
                        np.full(int(oav.sum()), 2)]),
        class_names=["gt", "multilevel", "oamix"])
    cv2.imwrite(osp.join(args.out_dir, "boxes_overlay.png"), overlay)
    print(f"wrote {args.out_dir}/ (clean + {aug.shape[0]} aug views + overlay)")


if __name__ == "__main__":
    main()
