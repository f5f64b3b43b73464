"""Dynamic (eager) mode: imperative ops on batches, capture-to-jit, checkpoint.

The dali_tpu analogue of the reference's `nvidia.dali.experimental.dynamic`
("ndd") examples: the same operators as `fn.*`, invoked imperatively on
`Batch` objects with no pipeline to define — then `ndd.capture` compiles the
same function into a replayable pipeline (jit on the device stage), and
`ndd.Checkpoint` snapshots stateful eager readers/RNG.

Run:
    python docs/examples/dynamic_mode.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.experimental.dynamic as ndd
from dali_tpu import types


def synth_images(n=8):
    rng = np.random.default_rng(3)
    return [rng.integers(0, 256, (72 + 8 * i, 96, 3), np.uint8) for i in range(n)]


def main():
    samples = synth_images()

    # -- eager: each call executes immediately --------------------------------
    batch = ndd.as_batch(samples, layout="HWC")
    resized = ndd.resize(batch, resize_x=64, resize_y=64)
    flipped = ndd.flip(resized, horizontal=1)
    out = ndd.crop_mirror_normalize(
        flipped, dtype=types.FLOAT, output_layout="CHW",
        mean=[128.0] * 3, std=[64.0] * 3)
    first = np.asarray(out.cpu().at(0))
    print(f"eager: {len(out)} samples, sample0 {first.shape} {first.dtype} "
          f"mean={first.mean():+.3f}")

    # -- capture: same code compiled into a pipeline, replayed ---------------
    @ndd.capture
    def frontend(imgs):
        imgs = ndd.resize(imgs, resize_x=64, resize_y=64)
        imgs = ndd.flip(imgs, horizontal=1)
        return ndd.crop_mirror_normalize(
            imgs, dtype=types.FLOAT, output_layout="CHW",
            mean=[128.0] * 3, std=[64.0] * 3)

    captured = frontend(ndd.as_batch(samples, layout="HWC"))
    cap0 = np.asarray(captured.cpu().at(0))
    np.testing.assert_allclose(cap0, first, atol=1e-5)
    print("capture: compiled replay matches eager output")

    # replays reuse the compiled pipeline (per batch-size cache)
    again = frontend(ndd.as_batch(synth_images(), layout="HWC"))
    print(f"capture: replay produced {len(again)} samples")

    # -- stateful eager reader + checkpoint/resume ---------------------------
    # Each ndd.readers.* call advances the SAME stateful instance (keyed by
    # its arguments in the EvalContext); ndd.Checkpoint snapshots the reader
    # cursor + eager RNG stream and resumes them in a fresh context.
    data_dir = tempfile.mkdtemp(prefix="ndd_")
    import cv2

    os.makedirs(os.path.join(data_dir, "c"), exist_ok=True)
    for i, img in enumerate(synth_images(6)):
        cv2.imwrite(os.path.join(data_dir, "c", f"{i}.jpg"), img)

    with ndd.EvalContext(seed=5) as ectx:
        ndd.readers.file(file_root=data_dir, batch_size=2)  # batch 1 consumed
        payload = ndd.Checkpoint.collect(ectx).serialize()
        next_jpegs, next_labels = ndd.readers.file(file_root=data_dir,
                                                   batch_size=2)  # batch 2

    with ndd.EvalContext(seed=0) as ectx2:
        ndd.Checkpoint.deserialize(payload).apply(ectx2)
        resumed_jpegs, resumed_labels = ndd.readers.file(file_root=data_dir,
                                                         batch_size=2)
    np.testing.assert_array_equal(np.asarray(next_labels.cpu().at(0)),
                                  np.asarray(resumed_labels.cpu().at(0)))
    np.testing.assert_array_equal(np.asarray(next_jpegs.cpu().at(0)),
                                  np.asarray(resumed_jpegs.cpu().at(0)))
    print("checkpoint: eager reader resumed deterministically")

    print("dynamic mode OK")


if __name__ == "__main__":
    main()
