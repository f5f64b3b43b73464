"""End-to-end example: SSD-style detection input pipeline (the dali_tpu
analogue of the reference's ``docs/examples/use_cases/detection_pipeline``):
COCO reader -> IoU-constrained random crop -> decode+slice -> color twist ->
resize -> bbox flip -> anchor matching (BoxEncoder).

Run (creates a tiny synthetic COCO set if no dataset given):
    python docs/examples/ssd_detection.py [--data-dir DIR --annotations FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from dali_tpu import fn, pipeline_def, types


def default_anchors(fig_size=300, feat_sizes=(38, 19, 10), scales=(21, 45, 99, 153)):
    """A small SSD300-style ltrb anchor grid (relative coords)."""
    boxes = []
    for idx, f in enumerate(feat_sizes):
        sk = scales[idx] / fig_size
        sk2 = scales[idx + 1] / fig_size
        for i in range(f):
            for j in range(f):
                cx, cy = (j + 0.5) / f, (i + 0.5) / f
                for w, h in ((sk, sk), (np.sqrt(sk * sk2),) * 2,
                             (sk * np.sqrt(2), sk / np.sqrt(2)),
                             (sk / np.sqrt(2), sk * np.sqrt(2))):
                    boxes.append((cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2))
    return np.clip(np.asarray(boxes, np.float32), 0.0, 1.0)


@pipeline_def
def ssd_pipe(file_root, annotations_file, anchors):
    jpegs, bboxes, labels = fn.readers.coco(
        file_root=file_root, annotations_file=annotations_file,
        ltrb=True, ratio=True, random_shuffle=True, name="Reader")
    crop_begin, crop_size, bboxes, labels = fn.random_bbox_crop(
        bboxes, labels,
        aspect_ratio=[0.5, 2.0], thresholds=[0.0, 0.1, 0.3, 0.5, 0.7, 0.9],
        scaling=[0.3, 1.0], allow_no_crop=True, num_attempts=4)
    images = fn.decoders.image_slice(jpegs, crop_begin, crop_size, device="cpu")
    images = fn.resize(images.gpu(), resize_x=300, resize_y=300)
    flip = fn.random.coin_flip(probability=0.5)
    bboxes = fn.bb_flip(bboxes, horizontal=flip, ltrb=True)
    images = fn.crop_mirror_normalize(
        images, mirror=flip, dtype=types.FLOAT, output_layout="CHW",
        mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
        std=[0.229 * 255, 0.224 * 255, 0.225 * 255])
    enc_boxes, enc_labels = fn.box_encoder(
        bboxes, labels, anchors=anchors.reshape(-1).tolist(), criteria=0.5)
    return images, enc_boxes, enc_labels


def make_synthetic_coco(root):
    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 0
    for i in range(16):
        h, w = int(rng.integers(240, 480)), int(rng.integers(320, 640))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img_{i:04d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.integers(1, 5))):
            bw, bh = float(rng.uniform(20, w / 2)), float(rng.uniform(20, h / 2))
            x, y = float(rng.uniform(0, w - bw)), float(rng.uniform(0, h - bh))
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.integers(1, 4)),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir")
    ap.add_argument("--annotations")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.data_dir and args.annotations:
        img_dir, ann_path = args.data_dir, args.annotations
    else:
        tmp = tempfile.mkdtemp(prefix="dali_tpu_ssd_")
        img_dir, ann_path = make_synthetic_coco(tmp)
        print(f"synthetic COCO at {tmp}")

    anchors = default_anchors()
    pipe = ssd_pipe(img_dir, ann_path, anchors,
                    batch_size=args.batch_size, num_threads=2, seed=42)
    pipe.build()
    for it in range(args.iters):
        t0 = time.time()
        images, boxes, labels = pipe.run()
        img = np.asarray(images.as_tensor())
        print(f"iter {it}: images {img.shape} "
              f"encoded boxes {boxes.at(0).shape} labels {labels.at(0).shape} "
              f"({time.time() - t0:.2f}s)")
    print("ok")


if __name__ == "__main__":
    main()
