"""Volumetric (DHWC) device support for the warp + convolution families
(VERDICT r2 weak #8; reference SupportVolumetric set: warp_affine.cc,
rotate.cc, gaussian_blur.cc, laplacian.cc)."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def _vol(seed=0, d=6, h=10, w=12, c=2):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (d, h, w, c), np.uint8)


def _run(device, body, vol):
    @pipeline_def(batch_size=1, num_threads=1, seed=3)
    def p():
        x = fn.external_source(source=lambda: [vol], batch=True, layout="DHWC")
        x = x.gpu() if device == "gpu" else x
        return body(x, device)

    pipe = p()
    pipe.build()
    (out,) = pipe.run()
    arr = np.asarray(out.as_tensor())[0] if device == "gpu" else np.asarray(out.at(0))
    return arr


def _both(body, vol, atol=1.0):
    a = _run("cpu", body, vol)
    b = _run("gpu", body, vol)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a.astype(np.float64), b.astype(np.float64),
                               atol=atol)
    return a


def test_gaussian_blur_volumetric_cpu_gpu():
    out = _both(lambda x, d: fn.gaussian_blur(x, device=d, sigma=1.2),
                _vol(1))
    assert out.shape == (6, 10, 12, 2)


def test_gaussian_blur_volumetric_per_axis_window():
    # depth smoothing actually mixes slices: a one-hot impulse must spread
    vol = np.zeros((5, 7, 7, 1), np.uint8)
    vol[2, 3, 3, 0] = 255
    out = _both(lambda x, d: fn.gaussian_blur(x, device=d, window_size=[3, 3, 3]),
                vol)
    assert out[1, 3, 3, 0] > 0 and out[3, 3, 3, 0] > 0


def test_laplacian_volumetric_cpu_gpu():
    out = _both(lambda x, d: fn.laplacian(x, device=d, window_size=3,
                                          dtype=types.FLOAT), _vol(2), atol=1e-2)
    assert out.dtype == np.float32


def test_warp_affine_volumetric_cpu_gpu():
    # scale + translate in 3-D (3x4 dst->src matrix, x/y/z row order)
    m = [0.9, 0.0, 0.0, 1.0,
         0.0, 1.1, 0.0, -2.0,
         0.0, 0.0, 0.8, 0.5]
    out = _both(lambda x, d: fn.warp_affine(x, device=d, matrix=m), _vol(3))
    assert out.shape == (6, 10, 12, 2)


def test_warp_affine_volumetric_identity_is_noop():
    vol = _vol(4)
    m = [1.0, 0.0, 0.0, 0.0,
         0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0]
    out = _run("cpu", lambda x, d: fn.warp_affine(x, device=d, matrix=m), vol)
    np.testing.assert_array_equal(out, vol)


def test_rotate_volumetric_z_quarter_turn_matches_rot90():
    # 90° about z == per-slice 2-D rotation; square slices keep extents
    vol = _vol(5, d=4, h=9, w=9, c=1)
    out = _both(lambda x, d: fn.rotate(x, device=d, angle=90.0,
                                       axis=[0.0, 0.0, 1.0], keep_size=True,
                                       interp_type=types.INTERP_NN), vol)
    for z in range(vol.shape[0]):
        np.testing.assert_array_equal(out[z, ..., 0],
                                      np.rot90(vol[z, ..., 0], k=1))


def test_rotate_volumetric_x_axis_mixes_depth():
    vol = np.zeros((7, 7, 5, 1), np.uint8)
    vol[1, 3, 2, 0] = 200
    out = _both(lambda x, d: fn.rotate(x, device=d, angle=90.0,
                                       axis=[1.0, 0.0, 0.0], keep_size=True,
                                       interp_type=types.INTERP_NN), vol)
    # the impulse moved out of its original depth slice
    assert out[1].sum() == 0 and out.sum() > 0
