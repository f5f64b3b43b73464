"""Framework iterators: JAX (sharded), PyTorch, and TensorFlow epoch loops.

The dali_tpu analogue of the reference's frameworks notebooks
(`docs/examples/frameworks/{jax,pytorch,tensorflow}/*`): the same pipeline
consumed through each framework's iterator with ``reader_name`` autosizing
and LastBatchPolicy epoch semantics. The JAX iterator assembles globally
sharded ``jax.Array``s (reference `plugin/jax/iterator.py:246`).

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
        python docs/examples/framework_iterators.py
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
from dali_tpu.plugin.base_iterator import LastBatchPolicy

N_IMAGES = 10
BATCH = 4


def make_dataset(root):
    import cv2

    rng = np.random.default_rng(12)
    for i in range(N_IMAGES):
        cls = os.path.join(root, f"class{i % 2}")
        os.makedirs(cls, exist_ok=True)
        cv2.imwrite(os.path.join(cls, f"{i:03d}.jpg"),
                    rng.integers(0, 256, (40, 40, 3), np.uint8))


def make_pipe(root, device="cpu"):
    @pipeline_def(batch_size=BATCH, num_threads=1, seed=7)
    def pipe():
        raw, label = fn.readers.file(file_root=root, random_shuffle=True,
                                     seed=3, name="reader")
        img = fn.decoders.image(
            raw, device="mixed" if device == "gpu" else "cpu",
            output_type=types.RGB)
        img = fn.resize(img, resize_x=24, resize_y=24)
        out = fn.crop_mirror_normalize(img, dtype=types.FLOAT,
                                       output_layout="CHW",
                                       mean=[128.0] * 3, std=[64.0] * 3)
        if device == "gpu":
            label = label.gpu()
        return out, label

    p = pipe()
    p.build()
    return p


def jax_loop(root):
    import jax

    from dali_tpu.plugin.jax import DALIGenericIterator

    it = DALIGenericIterator([make_pipe(root, "gpu")], ["images", "labels"],
                             reader_name="reader",
                             last_batch_policy=LastBatchPolicy.PARTIAL)
    seen = 0
    for batch in it:
        imgs = batch["images"]
        assert isinstance(imgs, jax.Array)
        seen += imgs.shape[0]
    assert seen == N_IMAGES, seen  # PARTIAL: the 10-image epoch ends exactly
    print(f"jax iterator: epoch of {seen} images as jax.Arrays "
          f"(devices: {len(jax.devices())})")


def pytorch_loop(root):
    import torch

    from dali_tpu.plugin.pytorch import DALIGenericIterator

    it = DALIGenericIterator([make_pipe(root)], ["images", "labels"],
                             reader_name="reader",
                             last_batch_policy=LastBatchPolicy.DROP)
    seen = 0
    for batch in it:
        imgs = batch[0]["images"]
        assert isinstance(imgs, torch.Tensor) and imgs.shape[1:] == (3, 24, 24)
        seen += imgs.shape[0]
    assert seen == (N_IMAGES // BATCH) * BATCH  # DROP: partial tail dropped
    print(f"pytorch iterator: {seen} images/epoch as torch.Tensors "
          f"(DROP policy dropped the {N_IMAGES % BATCH}-sample tail)")


def tf_loop(root):
    try:
        import tensorflow as tf
    except Exception:
        print("tensorflow not installed; skipping tf.data demo")
        return

    from dali_tpu.plugin.tf import DALIDataset

    ds = DALIDataset(pipeline=make_pipe(root),
                     output_dtypes=(tf.float32, tf.int32))
    n = 0
    for imgs, labels in ds.take(3):
        assert imgs.shape == (BATCH, 3, 24, 24)
        n += 1
    print(f"tf.data: {n} batches of {BATCH} as tf Tensors")


def main():
    root = tempfile.mkdtemp(prefix="fw_iter_")
    make_dataset(root)
    jax_loop(root)
    pytorch_loop(root)
    tf_loop(root)


if __name__ == "__main__":
    main()
