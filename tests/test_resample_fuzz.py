"""Property fuzz of the device resampler vs the numpy host path: random
interp types, antialias, up/downscale, sub-canvas extents, and edge-clamping
ROIs must agree (the matmul formulation is built from the same tap plan as
the host gathers — kernels/resample.py)."""

import numpy as np
import pytest

from dali_tpu.types import DALIInterpType

INTERPS = [
    DALIInterpType.INTERP_NN,
    DALIInterpType.INTERP_LINEAR,
    DALIInterpType.INTERP_TRIANGULAR,
    DALIInterpType.INTERP_CUBIC,
    DALIInterpType.INTERP_GAUSSIAN,
    DALIInterpType.INTERP_LANCZOS3,
]


def test_resample_device_matches_host_fuzz():
    import jax.numpy as jnp

    from dali_tpu.kernels.resample import host_resample, resample_batch

    rng = np.random.default_rng(1234)
    # static canvas/output shapes (one XLA program per interp x antialias);
    # extents and ROIs are traced arguments, so they vary freely per sample
    H, W, oh, ow = 64, 80, 32, 40
    N = 6
    for interp in INTERPS:
        for antialias in (False, True):
            eh = rng.integers(8, H + 1, N)
            ew = rng.integers(8, W + 1, N)
            # ROI may poke past the valid extent (edge-clamp path)
            ry = np.array([rng.uniform(-3, e - 2) for e in eh], np.float32)
            rx = np.array([rng.uniform(-3, e - 2) for e in ew], np.float32)
            rh = np.array([rng.uniform(2, e + 4) for e in eh], np.float32)
            rw = np.array([rng.uniform(2, e + 4) for e in ew], np.float32)
            imgs = rng.integers(0, 255, (N, H, W, 3), np.uint8)

            got = np.asarray(resample_batch(
                jnp.asarray(imgs),
                jnp.asarray(np.stack([eh, ew], 1), jnp.int32),
                jnp.asarray(np.stack([ry, rx], 1)),
                jnp.asarray(np.stack([rh, rw], 1)),
                oh, ow, interp, antialias, jnp.uint8))
            for i in range(N):
                ref = host_resample(imgs[i, :eh[i], :ew[i]], oh, ow, interp,
                                    antialias, roi_start=(ry[i], rx[i]),
                                    roi_size=(rh[i], rw[i]))
                diff = np.abs(got[i].astype(int) - ref.astype(int))
                # identical math, different accumulation order: at most 1 LSB
                # after the uint8 round, on a tiny fraction of pixels
                assert diff.max() <= 1, (interp, antialias, i, diff.max())
                assert (diff > 0).mean() < 0.02, (interp, antialias, i)


def test_volumetric_resize_cpu_gpu_parity():
    from dali_tpu import fn, pipeline_def

    rng = np.random.default_rng(5)
    vols = [rng.integers(0, 255, (10, 24, 20, 1), np.uint8),
            rng.integers(0, 255, (10, 24, 20, 1), np.uint8)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def pipe():
        x = fn.external_source(source=lambda: vols, batch=True, cycle=True,
                               layout="DHWC")
        c = fn.resize(x, resize_x=10, resize_y=12, resize_z=5)
        g = fn.resize(x.gpu(), resize_x=10, resize_y=12, resize_z=5)
        return c, g

    p = pipe()
    p.build()
    c, g = p.run()
    for i in range(2):
        ca = np.asarray(c.at(i))
        ga = np.asarray(g.as_tensor())[i]
        assert ca.shape == (5, 12, 10, 1)
        diff = np.abs(ca.astype(int) - ga.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.02, diff.max()
