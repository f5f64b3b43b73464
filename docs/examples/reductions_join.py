"""Reductions, tensor joining, and shape reinterpretation.

The dali_tpu analogue of the reference notebooks
`docs/examples/general/reductions.ipynb`, `tensor_join.ipynb`, and
`reinterpret.ipynb`: directional reductions with axes/axis_names and
keep_dims, cat/stack batch joining, and reshape/reinterpret/squeeze/
expand_dims layout plumbing.

Run:
    python docs/examples/reductions_join.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 3


def synth():
    rng = np.random.default_rng(9)
    return [rng.random((6, 8, 3)).astype(np.float32) for _ in range(BATCH)]


def main():
    xs = synth()

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=2)
    def reduce_pipe():
        x = fn.external_source(source=lambda: xs, batch=True, cycle=True,
                               layout="HWC")
        full_mean = fn.reductions.mean(x)                  # scalar per sample
        row_max = fn.reductions.max(x, axes=[1])           # reduce W
        ch_std = fn.reductions.std_dev(x, fn.reductions.mean(x, axis_names="HW"),
                                       axis_names="HW")    # per-channel
        kept = fn.reductions.sum(x, axes=[0, 1], keep_dims=True)
        joined_cat = fn.cat(x, x, axis=1)                  # widen W
        joined_stack = fn.stack(x, x, axis=0)              # new leading dim
        flat = fn.reshape(x, shape=[-1, 3], layout="NC")
        widened = fn.expand_dims(x, axes=[0], new_axis_names="F")
        squeezed = fn.squeeze(widened, axis_names="F")
        bits = fn.reinterpret(x, dtype=types.INT32)        # same bytes
        return (full_mean, row_max, ch_std, kept, joined_cat, joined_stack,
                flat, squeezed, bits)

    p = reduce_pipe()
    p.build()
    (full_mean, row_max, ch_std, kept, jcat, jstack, flat, squeezed,
     bits) = p.run()

    for i, x in enumerate(xs):
        np.testing.assert_allclose(np.asarray(full_mean.at(i)), x.mean(),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(row_max.at(i)), x.max(axis=1),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ch_std.at(i)),
                                   x.std(axis=(0, 1)), rtol=1e-4)
        assert np.asarray(kept.at(i)).shape == (1, 1, 3)
        np.testing.assert_allclose(np.asarray(jcat.at(i)),
                                   np.concatenate([x, x], axis=1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(jstack.at(i)),
                                   np.stack([x, x], axis=0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(flat.at(i)), x.reshape(-1, 3),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(squeezed.at(i)), x, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(bits.at(i)),
                                      x.view(np.int32))
    print(f"reductions: mean/max/std_dev over axes + keep_dims verified")
    print(f"join: cat {np.asarray(jcat.at(0)).shape}, "
          f"stack {np.asarray(jstack.at(0)).shape}; "
          f"reshape->{np.asarray(flat.at(0)).shape} layout NC; "
          f"reinterpret float32->int32 bit-exact")


if __name__ == "__main__":
    main()
