#!/usr/bin/env python
"""Generate a synthetic face-like PNG dataset in the reference's on-disk
layout (root/train/<id>#<clip>/%07d.png, root/test/...), for smoke training
without VoxCeleb (the 100-clip config of BASELINE.json configs[0]).

Each clip renders a moving "face": an ellipse head, two eyes and a mouth that
translate/rotate between frames, so keypoint/motion learning has real signal.
"""
import argparse
import os

import numpy as np
import imageio.v2 as imageio


def render_face(size, cx, cy, angle, mouth_open, hue):
    img = np.zeros((size, size, 3), np.float32)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    ca, sa = np.cos(angle), np.sin(angle)
    rx = (xx - cx) * ca + (yy - cy) * sa
    ry = -(xx - cx) * sa + (yy - cy) * ca
    head = ((rx / (0.28 * size)) ** 2 + (ry / (0.38 * size)) ** 2) <= 1.0
    base = np.array([0.8, 0.6 + 0.2 * hue, 0.5], np.float32)
    img[head] = base
    for ex in (-0.12, 0.12):
        eye = (((rx - ex * size) / (0.05 * size)) ** 2
               + ((ry + 0.1 * size) / (0.035 * size)) ** 2) <= 1.0
        img[eye] = np.array([0.05, 0.05, 0.1], np.float32)
    mouth = ((rx / (0.12 * size)) ** 2
             + ((ry - 0.15 * size) / ((0.02 + 0.05 * mouth_open) * size)) ** 2) <= 1.0
    img[mouth] = np.array([0.4, 0.1, 0.1], np.float32)
    noise = np.random.RandomState(0).rand(size, size, 1).astype(np.float32) * 0.05
    return np.clip(img + noise, 0, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--num_ids", type=int, default=5)
    p.add_argument("--clips_per_id", type=int, default=2)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    for split, n_ids in (("train", args.num_ids), ("test", max(1, args.num_ids // 3))):
        for i in range(n_ids):
            hue = rng.rand()
            for c in range(args.clips_per_id):
                clip_dir = os.path.join(args.out_dir, split, f"id{i:04d}#clip{c}")
                os.makedirs(clip_dir, exist_ok=True)
                cx = args.size * (0.5 + 0.1 * rng.randn())
                cy = args.size * (0.5 + 0.1 * rng.randn())
                for f in range(args.frames):
                    t = f / max(args.frames - 1, 1)
                    img = render_face(
                        args.size,
                        cx + args.size * 0.08 * np.sin(2 * np.pi * t + c),
                        cy + args.size * 0.05 * np.cos(2 * np.pi * t),
                        0.3 * np.sin(2 * np.pi * t + i),
                        0.5 + 0.5 * np.sin(4 * np.pi * t),
                        hue)
                    imageio.imsave(os.path.join(clip_dir, f"{f:07d}.png"),
                                   (img * 255).astype(np.uint8))
    print(f"wrote synthetic dataset to {args.out_dir}")


if __name__ == "__main__":
    main()
