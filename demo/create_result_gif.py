"""Stitch result images (e.g. from tools/analysis_tools/analyze_results.py)
into an animated GIF (analog of reference demo/create_result_gif.py:17-109,
which shells out to imageio; imageio is not in this image, so frames are
assembled and the GIF written with PIL directly).

Usage:
    python demo/create_result_gif.py RESULT_IMAGE_DIR --out result.gif
"""
import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image


def parse_args():
    p = argparse.ArgumentParser(description="Create GIF for demo")
    p.add_argument("image_dir", help="directory of result images "
                                     "(analyze_results.py output)")
    p.add_argument("--out", type=str, default="result.gif")
    p.add_argument("--duration", type=float, default=2.0,
                   help="seconds per frame")
    p.add_argument("--ncols", type=int, default=1,
                   help="images per frame (side by side)")
    return p.parse_args()


def load_images(image_dir):
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    names = sorted(n for n in os.listdir(image_dir)
                   if n.lower().endswith(exts))
    if not names:
        raise SystemExit(f"no images under {image_dir}")
    return [Image.open(osp.join(image_dir, n)).convert("RGB") for n in names]


def make_frames(images, ncols=1):
    """Group ``ncols`` images side by side per GIF frame (the reference
    tiles matplotlib subplots; a direct paste gives identical output
    without a figure round-trip)."""
    frames = []
    for i in range(0, len(images), ncols):
        group = images[i:i + ncols]
        h = max(im.height for im in group)
        w = sum(im.width for im in group)
        canvas = Image.new("RGB", (w, h), (255, 255, 255))
        x = 0
        for im in group:
            canvas.paste(im, (x, (h - im.height) // 2))
            x += im.width
        frames.append(canvas)
    return frames


def create_gif(frames, gif_name, duration=2.0):
    frames[0].save(gif_name, save_all=True, append_images=frames[1:],
                   duration=int(duration * 1000), loop=0)


def main():
    args = parse_args()
    frames = make_frames(load_images(args.image_dir), args.ncols)
    create_gif(frames, args.out, args.duration)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
