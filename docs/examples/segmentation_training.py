"""End-to-end example: semantic-segmentation input pipeline with PAIRED
image/mask augmentation (the dali_tpu analogue of the reference's
segmentation use cases).

The key pattern: geometric augmentations must transform the image and its
mask IDENTICALLY. Random parameters are drawn ONCE (cpu random ops) and fed
to both branches as tensor arguments, so the pair stays aligned by
construction; the mask branch uses nearest-neighbor interpolation to keep
labels categorical.

Run (synthetic blobs if no dataset given):
    python docs/examples/segmentation_training.py [--batch-size 4] [--iters 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from dali_tpu import fn, pipeline_def, types


def synth_pairs(n=32, seed=4):
    """Images with colored blobs + matching label masks."""
    rng = np.random.default_rng(seed)
    imgs, masks = [], []
    for _ in range(n):
        h, w = int(rng.integers(80, 128)), int(rng.integers(80, 128))
        img = rng.integers(0, 80, (h, w, 3), np.uint8)
        mask = np.zeros((h, w, 1), np.uint8)
        for lbl in range(1, int(rng.integers(2, 5))):
            cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
            r = int(rng.integers(6, 16))
            yy, xx = np.ogrid[:h, :w]
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[blob] = rng.integers(100, 255, 3)
            mask[blob, 0] = lbl
        imgs.append(img)
        masks.append(mask)
    return imgs, masks


@pipeline_def
def seg_pipe(imgs, masks, crop=64):
    # indexed callables: resumable (see docs/checkpointing.md) and they keep
    # the image/mask pair aligned by construction
    image = fn.external_source(
        source=lambda info: imgs[info.idx_in_epoch % len(imgs)], batch=False,
        layout="HWC")
    mask = fn.external_source(
        source=lambda info: masks[info.idx_in_epoch % len(masks)], batch=False,
        layout="HWC")
    # one draw per sample, applied to BOTH branches
    angle = fn.random.uniform(range=[-20.0, 20.0])
    mirror = fn.random.coin_flip(probability=0.5)
    px = fn.random.uniform(range=[0.0, 1.0])
    py = fn.random.uniform(range=[0.0, 1.0])

    image, mask = image.gpu(), mask.gpu()
    image = fn.rotate(image, angle=angle, keep_size=True, fill_value=0.0)
    mask = fn.rotate(mask, angle=angle, keep_size=True, fill_value=0.0,
                     interp_type=types.INTERP_NN)
    image = fn.crop_mirror_normalize(
        image, crop=(float(crop), float(crop)), crop_pos_x=px, crop_pos_y=py,
        mirror=mirror, dtype=types.FLOAT, output_layout="CHW",
        mean=[128.0] * 3, std=[64.0] * 3, out_of_bounds_policy="pad")
    mask = fn.crop_mirror_normalize(
        mask, crop=(float(crop), float(crop)), crop_pos_x=px, crop_pos_y=py,
        mirror=mirror, dtype=types.UINT8, output_layout="CHW",
        mean=[0.0], std=[1.0], out_of_bounds_policy="pad")
    return image, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--crop", type=int, default=64)
    args = ap.parse_args()

    imgs, masks = synth_pairs()
    pipe = seg_pipe(imgs, masks, crop=args.crop,
                    batch_size=args.batch_size, num_threads=2, seed=11)
    pipe.build()
    for it in range(args.iters):
        image, mask = pipe.run()
        im = np.asarray(image.as_tensor())
        mk = np.asarray(mask.as_tensor())
        assert im.shape == (args.batch_size, 3, args.crop, args.crop), im.shape
        assert mk.shape == (args.batch_size, 1, args.crop, args.crop), mk.shape
        labels = np.unique(mk)
        assert labels.max() <= 4, labels
        # alignment check: foreground mask pixels should overlap the bright
        # blobs in the (un-normalized) image far more often than background
        bright = (im * 64.0 + 128.0).mean(axis=1) > 90
        fg = mk[:, 0] > 0
        if fg.any() and (~fg).any():
            hit = bright[fg].mean()
            miss = bright[~fg].mean()
            assert hit > miss, (hit, miss)
        print(f"iter {it}: image {im.shape} mask {mk.shape} "
              f"labels {labels.tolist()} fg-bright {float(bright[fg].mean()):.2f}")
    print("ok")


if __name__ == "__main__":
    main()
