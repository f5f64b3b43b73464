"""WebDataset ingestion: tar shards -> sharded decode -> train-ready batches.

The dali_tpu analogue of the reference's webdataset example
(docs/examples/general/data_loading/dataloading_webdataset.ipynb): POSIX-tar
shards hold `<key>.jpg` + `<key>.cls` component files; `fn.readers.webdataset`
indexes each shard once and then reads components directly, with the same
shard_id/num_shards math as every other reader (one pipeline per shard here,
the multi-host pattern). Shards also load from `s3://` URIs via the built-in
SigV4 client, and pre-built `wds2idx` index files skip the indexing pass
(`index_paths=`).

Run (synthesizes two tar shards):
    python docs/examples/webdataset_ingest.py [--batch-size 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from dali_tpu import fn, pipeline_def, types


def synth_shards(root, n_shards=2, per_shard=12):
    """Write WebDataset-convention tar shards: sorted keys, one .jpg + one
    .cls member per sample key."""
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for s in range(n_shards):
        path = os.path.join(root, f"shard-{s:05d}.tar")
        with tarfile.open(path, "w") as tar:
            for i in range(per_shard):
                img = rng.integers(0, 256, (90 + 4 * i, 120, 3), np.uint8)
                ok, enc = cv2.imencode(".jpg", img)
                assert ok
                key = f"{s:05d}{i:04d}"
                for ext, payload in ((".jpg", enc.tobytes()),
                                     (".cls", str(i % 10).encode())):
                    info = tarfile.TarInfo(key + ext)
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
        paths.append(path)
    return paths


@pipeline_def
def wds_pipe(shards, shard_id=0, num_shards=1, size=64):
    jpeg, cls = fn.readers.webdataset(
        paths=shards, ext=["jpg", "cls"],
        shard_id=shard_id, num_shards=num_shards,
        random_shuffle=True, name="Reader",
    )
    images = fn.decoders.image(jpeg, device="mixed")
    images = fn.random_resized_crop(images, size=[size, size])
    images = fn.crop_mirror_normalize(
        images, dtype=types.FLOAT, output_layout="CHW",
        mean=[128.0] * 3, std=[64.0] * 3,
    )
    return images, cls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="wds_")
    shards = synth_shards(tmp)
    num_shards = 2

    # one pipeline per data shard — the per-host layout on a real pod
    pipes = []
    for shard_id in range(num_shards):
        p = wds_pipe(shards, shard_id=shard_id, num_shards=num_shards,
                     size=args.size, batch_size=args.batch_size,
                     num_threads=2, seed=11 + shard_id)
        p.build()
        pipes.append(p)

    for shard_id, p in enumerate(pipes):
        meta = p.reader_meta("Reader")
        print(f"shard {shard_id}: epoch_size={meta['epoch_size']} "
              f"(padded per-shard {meta['epoch_size_padded'] // num_shards})")

    for it in range(args.iters):
        for shard_id, p in enumerate(pipes):
            images, cls = p.run()
            arr = np.asarray(images.as_tensor())
            labels = [int(cls.at(i)[0]) - 48 if cls.at(i).dtype == np.uint8
                      else int(cls.at(i)) for i in range(len(cls))]
            print(f"iter {it} shard {shard_id}: images {arr.shape} "
                  f"{arr.dtype} labels[:4]={labels[:4]}")

    print("webdataset ingest OK")


if __name__ == "__main__":
    main()
