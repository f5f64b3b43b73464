"""Custom operators: your own Python, JAX, and numba code inside a pipeline.

The dali_tpu analogue of the reference's `docs/examples/custom_operations/`
notebooks: ``fn.python_function`` (host numpy), ``fn.jax_function`` (user JAX
code inlined into the single jitted device program — the TPU-native
equivalent of the reference's CUDA custom op), ``fn.dl_tensor_python_function``
(zero-copy DLPack), and ``fn.numba_function`` (njit-compiled when numba is
installed, plain-Python fallback otherwise).

Run:
    python docs/examples/custom_operators.py
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
    rng = np.random.default_rng(8)
    samples = [rng.integers(0, 256, (24, 32, 3), np.uint8) for _ in range(BATCH)]

    # -- host python_function: arbitrary per-sample numpy ---------------------
    def edge_enhance(img):
        f = img.astype(np.float32)
        blur = (f + np.roll(f, 1, 0) + np.roll(f, -1, 0)
                + np.roll(f, 1, 1) + np.roll(f, -1, 1)) / 5.0
        return np.clip(f + (f - blur) * 2.0, 0, 255).astype(np.uint8)

    # -- device jax_function: fused into the jitted device program -----------
    def channel_mix(x):
        import jax.numpy as jnp
        # x: [H, W, C] float — swap R/B and boost G (runs on TPU, fused)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        return jnp.stack([b, jnp.clip(g * 1.25, 0, 255), r], axis=-1)

    # -- dlpack python function: zero-copy in/out -----------------------------
    def dl_negate(dl):
        arr = np.from_dlpack(dl)
        return 255 - arr

    # -- numba function: njit when available ----------------------------------
    def numba_threshold(out_img, in_img):
        for i in range(in_img.shape[0]):
            for j in range(in_img.shape[1]):
                for c in range(in_img.shape[2]):
                    v = in_img[i, j, c]
                    out_img[i, j, c] = 255 if v > 127 else 0

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=4)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True,
                               layout="HWC")
        enhanced = fn.python_function(x, function=edge_enhance)
        mixed = fn.jax_function(fn.cast(x.gpu(), dtype=types.FLOAT),
                                function=channel_mix)
        negated = fn.dl_tensor_python_function(x, function=dl_negate,
                                               batch_processing=False)
        thresholded = fn.numba_function(
            x, run_fn=numba_threshold,
            out_types=[types.UINT8], in_types=[types.UINT8],
            outs_ndim=[3], ins_ndim=[3], setup_fn=None, batch_processing=False)
        return enhanced, mixed, negated, thresholded

    p = pipe()
    p.build()
    enhanced, mixed, negated, thresholded = p.run()

    for i, src in enumerate(samples):
        np.testing.assert_array_equal(np.asarray(enhanced.at(i)),
                                      edge_enhance(src))
        got_mix = np.asarray(mixed.at(i))
        np.testing.assert_allclose(got_mix[..., 0], src[..., 2], atol=1e-4)
        np.testing.assert_allclose(
            got_mix[..., 1], np.clip(src[..., 1].astype(np.float32) * 1.25,
                                     0, 255), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(negated.at(i)), 255 - src)
        np.testing.assert_array_equal(np.asarray(thresholded.at(i)),
                                      np.where(src > 127, 255, 0).astype(np.uint8))
    print("python_function: host numpy edge-enhance matches reference impl")
    print("jax_function: device channel mix fused into the jitted program")
    print("dl_tensor_python_function: zero-copy negate verified")
    print("numba_function: per-sample threshold kernel verified")


if __name__ == "__main__":
    main()
