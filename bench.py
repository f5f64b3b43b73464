"""Headline benchmark: ImageNet-style JPEG → train-ready images/sec/chip.

Mirrors the reference methodology (``internal_tools/hw_decoder_bench.py -p rn50``:
warmup then steady-state frames/sec; reference gate 19k fps on H100 with 70 CPU
threads). Baseline for vs_baseline is the BASELINE.json north star:
10,000 images/sec/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 10_000.0
DATA_DIR = "/tmp/dali_tpu_bench_data"
N_IMAGES = 512
BATCH = 256
WARMUP = 4
ITERS = 16


def ensure_dataset():
    import cv2

    marker = os.path.join(DATA_DIR, ".complete")
    if os.path.exists(marker):
        return
    os.makedirs(os.path.join(DATA_DIR, "class0"), exist_ok=True)
    rng = np.random.default_rng(1234)
    # ImageNet-ish size distribution (typical ~500x375)
    sizes = [(375, 500), (500, 375), (333, 500), (480, 640), (500, 500), (400, 600)]
    for i in range(N_IMAGES):
        h, w = sizes[i % len(sizes)]
        # low-frequency content compresses like natural images (not pure noise)
        small = rng.integers(0, 256, (h // 8, w // 8, 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(
            os.path.join(DATA_DIR, "class0", f"img_{i:05d}.jpg"),
            img,
            [cv2.IMWRITE_JPEG_QUALITY, 85],
        )
    with open(marker, "w") as f:
        f.write("ok")


def build_pipeline():
    from dali_tpu import fn, pipeline_def, types

    @pipeline_def(
        batch_size=BATCH,
        num_threads=max(os.cpu_count() or 1, 1),
        seed=42,
        prefetch_queue_depth=2,
    )
    def rn50_train():
        # RN50 training recipe with the hybrid TPU decoder fused with the RRC
        # window: the host samples the crop, entropy-copies ONLY its DCT
        # blocks (flat-packed int8 wire), the device runs IDCT/chroma/color at
        # 1/2 DCT scale and resizes the crop to 224 — wire and device work
        # scale with the crop, not the image.
        jpegs, labels = fn.readers.file(file_root=DATA_DIR, random_shuffle=True, name="Reader")
        images = fn.decoders.image_random_crop(
            jpegs, device="mixed", hybrid_device_decode=True, hybrid_scale=2,
        )
        images = fn.resize(images, resize_x=224, resize_y=224)
        mirror = fn.random.coin_flip(probability=0.5)
        images = fn.crop_mirror_normalize(
            images,
            mirror=mirror,
            dtype=types.FLOAT,
            output_layout="CHW",
            mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
            std=[0.229 * 255, 0.224 * 255, 0.225 * 255],
        )
        return images, labels

    return rn50_train()


def main():
    ensure_dataset()
    pipe = build_pipeline()
    pipe.build()
    # warmup (includes XLA compilation of the device stage)
    for _ in range(WARMUP):
        out = pipe.run()
        out[0].as_tensor().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        # consume each batch as a training step would
        out = pipe.run()
        out[0].as_tensor().block_until_ready()
    dt = time.perf_counter() - t0
    imgs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "imagenet_jpeg_to_train_ready_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 1),
                "unit": "images/s",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
