"""Feeding your own data: every external_source mode.

The dali_tpu analogue of the reference's
`docs/examples/general/data_loading/external_input.ipynb` (+
`parallel_external_source_fork.ipynb`): callables indexed by
``sample_info``, per-batch callables, generator functions with cycling,
``feed_input`` by name, and ``parallel=True`` — where the source runs in
forked worker processes feeding shared-memory slots
(`dali_tpu/_multiproc.py`, reference `_multiproc/pool.py`).

Run:
    python docs/examples/external_input.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 4


def main():
    # -- 1) per-sample callable: receives SampleInfo (idx, iteration, epoch) --
    def indexed_sample(info):
        return np.full((8, 8), info.idx_in_epoch, np.int32)

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=1)
    def per_sample():
        return fn.external_source(source=indexed_sample, batch=False)

    p = per_sample()
    p.build()
    (out,) = p.run()
    got = [int(np.asarray(out.at(i)).reshape(-1)[0]) for i in range(BATCH)]
    assert got == [0, 1, 2, 3]
    print(f"per-sample callable: batch filled with sample indices {got}")

    # -- 2) per-batch generator with cycling ---------------------------------
    def gen():
        for e in range(2):
            yield [np.full((4,), 10 * e + i, np.float32) for i in range(BATCH)]

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=1)
    def batched():
        return fn.external_source(source=gen, batch=True, cycle=True)

    p = batched()
    p.build()
    vals = []
    for _ in range(3):  # 3 runs over a 2-batch generator: cycles back
        (out,) = p.run()
        vals.append(int(np.asarray(out.at(0)).reshape(-1)[0]))
    assert vals == [0, 10, 0]
    print(f"generator with cycle=True: first-sample values over 3 runs {vals}")

    # -- 3) feed_input by name: push data explicitly per run -----------------
    @pipeline_def(batch_size=BATCH, num_threads=1, seed=1)
    def fed():
        x = fn.external_source(name="data", layout="HWC")
        return fn.resize(x, resize_x=16, resize_y=16)

    p = fed()
    p.build()
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 24, 3), np.uint8) for _ in range(BATCH)]
    p.feed_input("data", imgs, layout="HWC")
    (out,) = p.run()
    assert np.asarray(out.at(0)).shape == (16, 16, 3)
    print(f"feed_input: pushed {BATCH} ragged images, resized to "
          f"{np.asarray(out.at(0)).shape}")

    # -- 4) parallel=True: source runs in forked shm worker processes --------
    def heavy_sample(info):
        # stands in for expensive per-sample CPU work (decode, parse, ...)
        rng = np.random.default_rng(info.idx_in_epoch)
        return (rng.random((16, 16)) + info.idx_in_epoch).astype(np.float32)

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=1,
                  py_num_workers=2, py_start_method="fork")
    def parallel():
        return fn.external_source(source=heavy_sample, batch=False,
                                  parallel=True)

    p = parallel()
    p.build()
    (out,) = p.run()
    means = [float(np.asarray(out.at(i)).mean()) for i in range(BATCH)]
    assert all(i < m < i + 1 for i, m in enumerate(means))
    print(f"parallel external_source (2 fork workers): sample means {
          [round(m, 2) for m in means]}")


if __name__ == "__main__":
    main()
