"""End-to-end example: ImageNet-style training input pipeline feeding a JAX
train step over a data-parallel mesh (the dali_tpu analogue of the reference's
``docs/examples/use_cases`` RN50 recipes).

Run (uses synthetic JPEGs if no dataset given):
    python docs/examples/imagenet_training.py [--data-dir /path/to/imagenet/train]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dali_tpu import fn, pipeline_def, types
from dali_tpu.plugin.jax import DALIGenericIterator


@pipeline_def
def train_pipe(data_dir, shard_id=0, num_shards=1):
    jpegs, labels = fn.readers.file(
        file_root=data_dir, random_shuffle=True,
        shard_id=shard_id, num_shards=num_shards, name="Reader",
    )
    images = fn.decoders.image(
        jpegs, device="mixed", hybrid_device_decode=True, hybrid_scale=2, hybrid_wire="int8"
    )
    images = fn.random_resized_crop(images, size=[224, 224])
    mirror = fn.random.coin_flip(probability=0.5)
    images = fn.crop_mirror_normalize(
        images, mirror=mirror, dtype=types.FLOAT, output_layout="CHW",
        mean=[0.485 * 255, 0.456 * 255, 0.406 * 255],
        std=[0.229 * 255, 0.224 * 255, 0.225 * 255],
    )
    return images, labels


def synth_dataset(root, n=64):
    import cv2

    os.makedirs(os.path.join(root, "class0"), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        small = rng.integers(0, 256, (47, 63, 3), np.uint8)
        img = cv2.resize(small, (500, 375), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, "class0", f"{i}.jpg"), img)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    data_dir = args.data_dir or synth_dataset("/tmp/dali_tpu_example_data")

    devices = jax.local_devices()
    mesh = Mesh(np.array(devices), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    pipes = [
        train_pipe(
            data_dir, shard_id=i, num_shards=len(devices),
            batch_size=args.batch_size // len(devices), num_threads=4, seed=42 + i,
        )
        for i in range(len(devices))
    ]
    it = DALIGenericIterator(pipes, ["images", "labels"], reader_name="Reader",
                             auto_reset=True, sharding=sharding)

    # a toy model + sharded train step (images arrive already sharded over "data")
    rngk = jax.random.PRNGKey(0)
    params = {
        "w": jax.device_put(jax.random.normal(rngk, (3 * 224 * 224, 1000)) * 0.01,
                            NamedSharding(mesh, P(None, None))),
    }

    @jax.jit
    def train_step(params, images, labels):
        x = images.reshape(images.shape[0], -1)
        logits = x @ params["w"]
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels.astype(jnp.int32), axis=1))
        grads = jax.grad(lambda p: -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(x @ p["w"]), labels.astype(jnp.int32), axis=1)
        ))(params)
        return loss, jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)

    # warmup (compiles the train step + the pipeline device program)
    batch = next(it)
    loss, params = train_step(params, batch["images"], batch["labels"])
    loss.block_until_ready()
    t0 = time.perf_counter()
    for step, batch in zip(range(args.steps), it):
        loss, params = train_step(params, batch["images"], batch["labels"])
    last = float(loss)  # fetch the value: forces completion even on
    # transports where block_until_ready only awaits enqueue
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps, last loss {last:.3f}, "
          f"{args.steps * args.batch_size / dt:.0f} img/s end-to-end")


if __name__ == "__main__":
    main()
