"""EfficientNet-style input pipeline with AutoAugment — the dali_tpu analogue
of the reference's TL3 EfficientNet benchmark recipe
(``qa/TL3_EfficientNet_benchmark``: DALI input + AutoAugment/TrivialAugment
policies feeding AMP training).

The AutoAugment policy runs as per-sample conditionals lowered to
predication on the device (``_conditionals.py``); the whole augmented
subgraph still compiles into ONE XLA program.

Run (uses synthetic JPEGs if no dataset given):
    python docs/examples/efficientnet_autoaugment.py [--data-dir DIR]
        [--augment auto|trivial|none] [--steps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from dali_tpu import fn, pipeline_def, types
from dali_tpu.auto_aug.auto_augment import auto_augment_image_net
from dali_tpu.auto_aug.trivial_augment import trivial_augment_wide
from dali_tpu.plugin.jax import DALIGenericIterator


def make_synthetic_jpegs(n=48, classes=3):
    import cv2

    root = tempfile.mkdtemp(prefix="dali_tpu_effnet_")
    rng = np.random.default_rng(11)
    for c in range(classes):
        d = os.path.join(root, f"class{c}")
        os.makedirs(d)
        for i in range(n // classes):
            h, w = int(rng.integers(180, 320)), int(rng.integers(180, 320))
            small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
            img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(d, f"{i}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 88])
    return root


@pipeline_def(enable_conditionals=True)
def effnet_pipe(data_dir, augment, image_size):
    jpegs, labels = fn.readers.file(file_root=data_dir, random_shuffle=True,
                                    name="Reader")
    images = fn.decoders.image(jpegs, device="mixed",
                               hybrid_device_decode=True, hybrid_scale=2,
                               hybrid_wire="int8")
    images = fn.random_resized_crop(images, size=[image_size, image_size])
    if augment == "auto":
        images = auto_augment_image_net(images)
    elif augment == "trivial":
        images = trivial_augment_wide(images)
    mirror = fn.random.coin_flip(probability=0.5)
    images = fn.crop_mirror_normalize(
        images, mirror=mirror, dtype=types.FLOAT, output_layout="CHW",
        mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
        std=[0.229 * 255, 0.224 * 255, 0.225 * 255])
    return images, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--augment", choices=["auto", "trivial", "none"],
                    default="auto")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    root = args.data_dir or make_synthetic_jpegs()
    pipe = effnet_pipe(root, args.augment, args.image_size,
                       batch_size=args.batch_size, num_threads=2, seed=17)
    it = DALIGenericIterator([pipe], ["images", "labels"],
                             reader_name="Reader", auto_reset=True)
    t0 = time.perf_counter()
    n = 0
    for step, batch in zip(range(args.steps), it):
        x = batch["images"]
        assert x.shape == (args.batch_size, 3, args.image_size, args.image_size)
        n += args.batch_size
    dt = time.perf_counter() - t0
    print(f"{args.augment}-augmented: {args.steps} steps, "
          f"{n / dt:.1f} img/s end-to-end, output {tuple(x.shape)} {x.dtype}")


if __name__ == "__main__":
    main()
