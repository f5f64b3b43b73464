"""Separable (MXU) lowering of axis-aligned affine warps (VERDICT r3 #5).

Scale+translate matrices route to the two-matmul form
(`kernels/warp.py warp_affine_separable_batch`); general affines stay on
gathers. Parity is exact vs the gather path (docs/performance.md)."""

import numpy as np
import pytest

import jax

from dali_tpu import fn, pipeline_def
from dali_tpu.backend.warp import WarpAffineGPU
from dali_tpu.kernels import warp as wk
from dali_tpu.types import DALIInterpType


@pytest.mark.parametrize("interp", [DALIInterpType.INTERP_LINEAR,
                                    DALIInterpType.INTERP_NN])
@pytest.mark.parametrize("fill", [0.0, 64.0])
def test_separable_matches_gather_bitexact(interp, fill):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, H, W, C = 4, 57, 71, 3
    data = jnp.asarray(rng.integers(0, 255, (N, H, W, C), np.uint8))
    exts = jnp.asarray(np.array([[H, W], [H - 5, W - 3], [40, 60], [H, W]], np.int32))
    mats = np.zeros((N, 2, 3), np.float32)
    for i in range(N):
        mats[i] = [[rng.uniform(0.5, 1.8), 0, rng.uniform(-8, 8)],
                   [0, rng.uniform(0.5, 1.8), rng.uniform(-8, 8)]]
    mats = jnp.asarray(mats)
    a = np.asarray(wk.warp_affine_batch(data, mats, 48, 52, exts, interp, fill, np.uint8))
    b = np.asarray(wk.warp_affine_separable_batch(data, mats, 48, 52, exts, interp, fill, np.uint8))
    np.testing.assert_array_equal(a, b)


def test_routing_static_picks_separable():
    img = np.arange(32 * 40 * 3, dtype=np.uint8).reshape(32, 40, 3)
    seen = []
    orig = wk.warp_affine_separable_batch

    def spy(*a, **k):
        seen.append(True)
        return orig(*a, **k)

    wk.warp_affine_separable_batch = spy
    try:
        @pipeline_def(batch_size=1, num_threads=1, seed=2)
        def p():
            x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
            return fn.warp_affine(x.gpu(), matrix=[0.8, 0.0, 2.0, 0.0, 1.2, -3.0],
                                  size=[24, 30])

        pipe = p()
        pipe.build()
        out = np.asarray(pipe.run()[0].as_tensor())
        assert seen, "axis-aligned matrix did not route to the separable path"
        assert out.shape == (1, 24, 30, 3)
    finally:
        wk.warp_affine_separable_batch = orig


def test_general_affine_stays_on_gather():
    img = np.arange(32 * 40 * 3, dtype=np.uint8).reshape(32, 40, 3)
    seen = []
    orig = wk.warp_affine_separable_batch
    wk.warp_affine_separable_batch = lambda *a, **k: seen.append(True) or orig(*a, **k)
    try:
        @pipeline_def(batch_size=1, num_threads=1, seed=2)
        def p():
            x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
            # rotation: off-diagonals nonzero -> gather
            return fn.warp_affine(x.gpu(), matrix=[0.9, 0.2, 0.0, -0.2, 0.9, 0.0])

        pipe = p()
        pipe.build()
        pipe.run()
        assert not seen
    finally:
        wk.warp_affine_separable_batch = orig
