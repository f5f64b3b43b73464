"""Per-sample conditional execution inside a pipeline.

The dali_tpu analogue of the reference's `docs/examples/general/conditionals.ipynb`:
with ``enable_conditionals=True`` the ``@pipeline_def`` body may branch on
per-sample scalar DataNodes with plain Python ``if``/``else`` — the tracer
(AST rewrite, `dali_tpu/_conditionals.py`) lowers the branches to a
predicated Merge so every sample takes its own path. On TPU the merge is a
masked select inside the single jitted device program (no batch split).

Run:
    python docs/examples/conditionals.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 8


def synth(n=BATCH):
    rng = np.random.default_rng(7)
    return [rng.integers(0, 256, (48, 64, 3), np.uint8) for _ in range(n)]


def main():
    samples = synth()

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=11,
                  enable_conditionals=True)
    def augment():
        imgs = fn.external_source(source=lambda: samples, batch=True,
                                  cycle=True, layout="HWC")
        # per-sample coin flip decides the branch each sample takes
        flip_it = fn.random.coin_flip(probability=0.5, dtype=types.BOOL)
        if flip_it:
            out = fn.flip(imgs, horizontal=1)
        else:
            out = fn.brightness(imgs, brightness=1.5)
        # conditions compose: nested ifs and boolean scalars both work
        dark = fn.reductions.mean(fn.cast(imgs, dtype=types.FLOAT)) < 100.0
        if dark and not flip_it:
            out = fn.brightness(out, brightness=1.2)
        return out, flip_it

    p = augment()
    p.build()
    out, flips = p.run()

    flipped = [bool(np.asarray(flips.at(i))) for i in range(BATCH)]
    assert any(flipped) and not all(flipped), "both branches should be taken"
    for i, src in enumerate(samples):
        got = np.asarray(out.at(i))
        if flipped[i]:
            np.testing.assert_array_equal(got, src[:, ::-1])
            kind = "flipped"
        else:
            assert got.astype(np.float32).mean() >= src.mean(), i
            kind = "brightened"
        print(f"sample {i}: {kind}")
    print(f"conditionals: {sum(flipped)}/{BATCH} samples took the flip branch")


if __name__ == "__main__":
    main()
