"""Volumetric (3D) processing: DHWC volumes through the device pipeline.

The dali_tpu analogue of the reference's
`docs/examples/image_processing/3d_transforms.ipynb`: volumetric resize,
rotation about an axis, warp via a 3x4 affine matrix, crop/pad and flip on
DHWC volumes (reference warp.h SupportVolumetric; rotate_params.h Rodrigues
branch).

Run:
    python docs/examples/transforms_3d.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 2
D, H, W = 12, 24, 28


def synth_volumes():
    rng = np.random.default_rng(17)
    vols = []
    for _ in range(BATCH):
        v = rng.integers(0, 256, (D, H, W, 1), np.uint8)
        v[D // 3: 2 * D // 3, H // 3: 2 * H // 3, W // 3: 2 * W // 3] = 255
        vols.append(v)
    return vols


def main():
    vols = synth_volumes()

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=3)
    def vol_pipe():
        v = fn.external_source(source=lambda: vols, batch=True, cycle=True,
                               layout="DHWC")
        resized = fn.resize(v, resize_x=16, resize_y=16, resize_z=8)
        rot = fn.rotate(v, angle=45.0, axis=[0.0, 0.0, 1.0], fill_value=0.0)
        warped = fn.warp_affine(
            v, matrix=[1.0, 0.0, 0.0, 0.0,
                       0.0, 1.0, 0.1, 0.0,
                       0.0, 0.1, 1.0, 0.0], fill_value=0.0)
        flipped = fn.flip(v, depthwise=1, horizontal=0, vertical=0)
        padded = fn.pad(v, axis_names="DHW", shape=[16, 32, 32])
        cropped = fn.crop(v, crop_d=8, crop_h=16, crop_w=16)
        return resized, rot, warped, flipped, padded, cropped

    p = vol_pipe()
    p.build()
    resized, rot, warped, flipped, padded, cropped = p.run()

    def shp(tl, i=0):
        return tuple(np.asarray(tl.at(i)).shape)

    assert shp(resized) == (8, 16, 16, 1)
    assert shp(rot) == (D, H, W, 1)
    assert shp(warped) == (D, H, W, 1)
    assert shp(padded) == (16, 32, 32, 1)
    assert shp(cropped) == (8, 16, 16, 1)
    np.testing.assert_array_equal(np.asarray(flipped.at(0)), vols[0][::-1])

    # the rotated bright cube keeps its mass (rotation about z preserves
    # depth-slices; fill adds zeros at corners)
    rot0 = np.asarray(rot.at(0)).astype(np.int64)
    src_mass = vols[0].astype(np.int64).sum()
    assert 0.7 * src_mass < rot0.sum() <= src_mass
    for name, tl in [("resize", resized), ("rotate", rot), ("warp", warped),
                     ("flip", flipped), ("pad", padded), ("crop", cropped)]:
        print(f"  {name:7s} -> {shp(tl)}")
    print("3d transforms: all volumetric ops OK (DHWC)")


if __name__ == "__main__":
    main()
