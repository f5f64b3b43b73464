"""Shared test utilities — the analogue of the reference
``dali/test/python/test_utils.py`` (``check_batch`` :252, ``compare_pipelines``
:366, ``RandomlyShapedDataIterator`` :443)."""

from __future__ import annotations

import numpy as np


def to_samples(tensor_list):
    tl = tensor_list.as_cpu() if hasattr(tensor_list, "as_cpu") else tensor_list
    return [np.asarray(tl.at(i)) for i in range(len(tl))]


def check_batch(a, b, atol=1e-5, rtol=1e-5):
    """Compare two TensorLists sample by sample (reference check_batch)."""
    sa, sb = to_samples(a), to_samples(b)
    assert len(sa) == len(sb), (len(sa), len(sb))
    for i, (x, y) in enumerate(zip(sa, sb)):
        assert x.shape == y.shape, f"sample {i}: {x.shape} vs {y.shape}"
        np.testing.assert_allclose(
            x.astype(np.float64), y.astype(np.float64), atol=atol, rtol=rtol,
            err_msg=f"sample {i}",
        )


def compare_pipelines(pipe1, pipe2, batch_size=None, n_iters=2, atol=1e-5, rtol=1e-5):
    """Golden pattern: run two pipelines, assert equal outputs
    (reference compare_pipelines)."""
    for _ in range(n_iters):
        out1 = pipe1.run()
        out2 = pipe2.run()
        assert len(out1) == len(out2)
        for a, b in zip(out1, out2):
            check_batch(a, b, atol=atol, rtol=rtol)


class RandomlyShapedDataIterator:
    """Batches of randomly-shaped samples (reference :443)."""

    def __init__(self, batch_size, min_shape=(16, 16, 3), max_shape=(64, 64, 3),
                 dtype=np.uint8, seed=0):
        self.batch_size = batch_size
        self.min_shape = min_shape
        self.max_shape = max_shape
        self.dtype = dtype
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self):
        out = []
        for _ in range(self.batch_size):
            shape = [
                int(self.rng.integers(lo, hi + 1))
                for lo, hi in zip(self.min_shape, self.max_shape)
            ]
            if np.issubdtype(self.dtype, np.integer):
                out.append(self.rng.integers(0, 255, shape).astype(self.dtype))
            else:
                out.append(self.rng.random(shape).astype(self.dtype))
        return out
