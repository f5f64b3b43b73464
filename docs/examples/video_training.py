"""End-to-end example: video-clip training input pipeline (the dali_tpu
analogue of the reference's ``docs/examples/sequence_processing`` video
reader recipes): readers.video -> per-frame resize -> normalize, batched
[N, F, C, H, W] float sequences ready for a video model.

Run (writes tiny synthetic videos if no dataset given):
    python docs/examples/video_training.py [--file-root DIR]
  DIR layout: one subdirectory per class, video files inside.
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


@pipeline_def
def video_pipe(file_root, sequence_length=8):
    frames, labels = fn.readers.video(
        file_root=file_root, sequence_length=sequence_length, stride=2,
        random_shuffle=True, pad_mode="edge", name="Reader")
    frames = fn.resize(frames.gpu(), resize_x=112, resize_y=112)
    # per-FRAME spatial augmentations with per-SEQUENCE random parameters
    # (reference sequence broadcasting: one draw applies to every frame of a
    # clip — temporal consistency): rotate, blur, horizontal flip
    angle = fn.random.uniform(range=[-8.0, 8.0])
    frames = fn.rotate(frames, angle=angle, keep_size=True, fill_value=0.0)
    sigma = fn.random.uniform(range=[0.1, 1.1])
    frames = fn.gaussian_blur(frames, sigma=sigma)
    mirror = fn.random.coin_flip(probability=0.5)
    frames = fn.crop_mirror_normalize(
        frames, mirror=mirror, dtype=types.FLOAT, output_layout="FCHW",
        mean=[0.45 * 255] * 3, std=[0.225 * 255] * 3)
    return frames, labels


def make_synthetic_videos(root, classes=2, per_class=3):
    import cv2

    rng = np.random.default_rng(7)
    for c in range(classes):
        d = os.path.join(root, f"class{c}")
        os.makedirs(d, exist_ok=True)
        for v in range(per_class):
            path = os.path.join(d, f"v{v}.mp4")
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12,
                                 (160, 120))
            base = rng.integers(0, 200, (120, 160, 3), np.uint8)
            for f in range(int(rng.integers(24, 48))):
                frame = np.roll(base, shift=3 * f, axis=1)  # motion
                wr.write(frame)
            wr.release()
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file-root")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    root = args.file_root
    if not root:
        root = make_synthetic_videos(tempfile.mkdtemp(prefix="dali_tpu_video_"))
        print(f"synthetic videos at {root}")

    pipe = video_pipe(root, batch_size=args.batch_size, num_threads=2, seed=7)
    pipe.build()
    meta = pipe.reader_meta("Reader")
    print(f"{meta['epoch_size']} sequences/epoch")
    for it in range(args.iters):
        t0 = time.time()
        frames, labels = pipe.run()
        arr = np.asarray(frames.as_tensor())
        print(f"iter {it}: {arr.shape} {arr.dtype} labels "
              f"{np.asarray(labels.as_tensor()).reshape(-1)} "
              f"({time.time() - t0:.2f}s)")
    print("ok")


if __name__ == "__main__":
    main()
