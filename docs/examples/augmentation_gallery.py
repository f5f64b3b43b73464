"""Augmentation gallery: one pipeline exercising the image-processing family.

The dali_tpu analogue of the reference's
`docs/examples/image_processing/augmentation_gallery.ipynb` (+ the
brightness_contrast / hsv / color_space / warp / interp_types notebooks):
geometric warps, color manipulation, noise, erasing, and JPEG distortion in
one pass over synthetic images, printing per-op output stats.

Run:
    python docs/examples/augmentation_gallery.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 4
H, W = 48, 64


def main():
    rng = np.random.default_rng(21)
    samples = [rng.integers(0, 256, (H, W, 3), np.uint8) for _ in range(BATCH)]

    def augment_all(x):
        return {
            # geometric
            "rotate": fn.rotate(x, angle=fn.random.uniform(range=[-30., 30.]),
                                keep_size=True, fill_value=0.0),
            "warp_affine": fn.warp_affine(
                x, matrix=[1.0, 0.15, 0.0, 0.05, 1.0, 2.0], fill_value=128.0),
            "water": fn.water(x),
            "sphere": fn.sphere(x),
            "jitter": fn.jitter(x, nDegree=2),
            "flip": fn.flip(x, horizontal=1),
            # color
            "brightness_contrast": fn.brightness_contrast(
                x, brightness=1.2, contrast=1.3),
            "hsv": fn.hsv(x, hue=30.0, saturation=1.2, value=1.0),
            "color_twist": fn.color_twist(x, hue=15.0, saturation=0.8,
                                          brightness=1.1, contrast=1.05),
            "grayscale": fn.color_space_conversion(
                x, image_type=types.RGB, output_type=types.GRAY),
            "equalize": fn.experimental.equalize(x),
            # masking / structure
            "grid_mask": fn.grid_mask(x, tile=16, ratio=0.4, angle=0.3),
            "erase": fn.erase(x, anchor=[0.2, 0.3], shape=[0.4, 0.3],
                              axis_names="HW", normalized=True,
                              fill_value=100.0),
            # noise / codec artifacts
            "gaussian_noise": fn.noise.gaussian(x, stddev=12.0),
            "salt_pepper": fn.noise.salt_and_pepper(x, prob=0.03),
            "jpeg_artifacts": fn.jpeg_compression_distortion(x, quality=8),
            # filters
            "gaussian_blur": fn.gaussian_blur(x, sigma=1.4),
            "laplacian": fn.laplacian(x, window_size=3, dtype=types.FLOAT),
        }

    names = []

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=33)
    def gallery_pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC")
        outs = augment_all(x)
        names[:] = sorted(outs)
        return tuple(outs[n] for n in names)

    p = gallery_pipe()
    p.build()
    results = p.run()
    src_mean = np.mean([s.mean() for s in samples])
    print(f"source: {BATCH} images {H}x{W}, mean {src_mean:.1f}")
    for name, tl in zip(names, results):
        s0 = np.asarray(tl.at(0))
        assert s0.size > 0, name
        print(f"  {name:20s} -> {str(s0.shape):14s} {str(s0.dtype):8s} "
              f"mean {float(np.asarray(s0, np.float64).mean()):7.1f}")
    print(f"augmentation gallery: {len(names)} ops OK")


if __name__ == "__main__":
    main()
