"""Arithmetic expressions on DataNodes: blending, masking, type promotion.

The dali_tpu analogue of the reference's expression notebooks
(`docs/examples/general/expressions/expr_blend_image.ipynb`,
`expr_conditional_and_masking.ipynb`, `expr_type_promotions.ipynb`):
operator overloads on DataNodes capture an expression tree
(`dali_tpu/math.py`) that XLA fuses into the device program for free.

Run:
    python docs/examples/expressions.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import dali_tpu.fn as fn
import dali_tpu.math as dmath
import dali_tpu.types as types
from dali_tpu import pipeline_def

BATCH = 4
H, W = 40, 56


def synth():
    rng = np.random.default_rng(3)
    a = [rng.integers(0, 256, (H, W, 3), np.uint8) for _ in range(BATCH)]
    b = [rng.integers(0, 256, (H, W, 3), np.uint8) for _ in range(BATCH)]
    return a, b


def main():
    xs, ys = synth()

    @pipeline_def(batch_size=BATCH, num_threads=1, seed=5)
    def exprs():
        a = fn.external_source(source=lambda: xs, batch=True, cycle=True,
                               layout="HWC")
        b = fn.external_source(source=lambda: ys, batch=True, cycle=True,
                               layout="HWC")
        af = fn.cast(a, dtype=types.FLOAT)
        bf = fn.cast(b, dtype=types.FLOAT)

        # 1) blend: per-sample random weight (scalar broadcasts over HWC)
        w = fn.random.uniform(range=[0.2, 0.8])
        blend = af * w + bf * (1.0 - w)

        # 2) masking via comparisons: binarize around the per-sample mean
        mean = fn.reductions.mean(af)
        mask = fn.cast(af > mean, dtype=types.FLOAT)
        masked = af * mask

        # 3) math DSL + type promotion: uint8 + int32 -> int32, clamp, sqrt
        promoted = a + fn.cast(b, dtype=types.INT32)  # promotes to int32
        clamped = dmath.clamp(promoted, 0, 255)
        root = dmath.sqrt(af + 1.0)
        return blend, masked, w, clamped, root

    p = exprs()
    p.build()
    blend, masked, w, clamped, root = p.run()

    for i in range(BATCH):
        wi = float(np.asarray(w.at(i)).reshape(-1)[0])
        want = xs[i] * wi + ys[i] * (1.0 - wi)
        np.testing.assert_allclose(np.asarray(blend.at(i)), want, atol=1e-2)
    np.testing.assert_array_equal(
        np.asarray(clamped.at(0)),
        np.clip(xs[0].astype(np.int64) + ys[0], 0, 255).astype(np.int32))
    np.testing.assert_allclose(np.asarray(root.at(0)),
                               np.sqrt(xs[0].astype(np.float32) + 1.0),
                               rtol=1e-5)
    m0 = np.asarray(masked.at(0))
    assert (m0 == 0).any() and (m0 > 0).any()
    print(f"blend weights: {[round(float(np.asarray(w.at(i)).reshape(-1)[0]), 3) for i in range(BATCH)]}")
    print(f"clamped dtype: {np.asarray(clamped.at(0)).dtype} (uint8+int32 -> int32)")
    print("expressions: blend / mask / promotion / math DSL all verified")


if __name__ == "__main__":
    main()
