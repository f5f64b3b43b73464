"""Pipeline checkpointing: snapshot mid-epoch, resume deterministically.

The dali_tpu analogue of the reference's
`docs/examples/advanced/pipeline_checkpointing.ipynb`: with
``enable_checkpointing=True`` every stateful op (readers' cursors, RNG
streams, indexed external sources) contributes its state to
``pipe.checkpoint()``; a new pipeline built with ``checkpoint=`` continues
bit-identically — across processes too (the state is plain bytes).

Run:
    python docs/examples/checkpointing.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 4


def make_dataset(root, n=10):
    import cv2

    rng = np.random.default_rng(1)
    for i in range(n):
        cls = os.path.join(root, f"class{i % 2}")
        os.makedirs(cls, exist_ok=True)
        img = rng.integers(0, 256, (40, 48, 3), np.uint8)
        cv2.imwrite(os.path.join(cls, f"{i:03d}.jpg"), img)


def make_pipe(root, checkpoint=None):
    @pipeline_def(batch_size=BATCH, num_threads=1, seed=42,
                  enable_checkpointing=True, checkpoint=checkpoint)
    def pipe():
        raw, label = fn.readers.file(file_root=root, random_shuffle=True,
                                     seed=7, name="reader")
        img = fn.decoders.image(raw, output_type=types.RGB)
        img = fn.random_resized_crop(img, size=[32, 32], seed=5)
        noise_scale = fn.random.uniform(range=[0.0, 1.0], seed=9)
        out = fn.cast(img, dtype=types.FLOAT) * noise_scale
        return out, label

    p = pipe()
    p.build()
    return p


def batches(p, k):
    out = []
    for _ in range(k):
        img, label = p.run()
        out.append((np.asarray(img.as_tensor() if hasattr(img, "as_tensor")
                               else img.at(0)),
                    [int(np.asarray(label.at(i)).reshape(-1)[0])
                     for i in range(BATCH)]))
    return out


def main():
    root = tempfile.mkdtemp(prefix="ckpt_example_")
    make_dataset(root)

    # run 3 iterations (crosses the epoch boundary: 10 imgs / batch 4),
    # snapshot, then run 2 more — the "expected" continuation
    p1 = make_pipe(root)
    batches(p1, 3)
    state = p1.checkpoint()
    expected = batches(p1, 2)
    print(f"checkpoint captured after 3 iterations: {len(state)} bytes")

    # a fresh pipeline restored from the snapshot replays the continuation
    p2 = make_pipe(root, checkpoint=state)
    resumed = batches(p2, 2)
    for (ei, el), (ri, rl) in zip(expected, resumed):
        np.testing.assert_array_equal(ei, ri)
        assert el == rl
    print("resumed pipeline reproduced the next 2 batches bit-identically")
    print(f"  (reader shuffle order, RRC windows, and RNG scale all resumed; "
          f"labels {expected[0][1]} == {resumed[0][1]})")


if __name__ == "__main__":
    main()
