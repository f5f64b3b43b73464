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


def test_pad_volumetric_ragged_cpu_gpu():
    # ragged DHWC batch, all-axis pad with align: device output must crop the
    # quantized staging canvas down to the pad target (reference pad.cc:
    # output extents are the batch max rounded to `align`)
    rng = np.random.default_rng(11)
    vols = [rng.integers(0, 255, s, np.uint8)
            for s in [(4, 6, 8, 1), (6, 5, 7, 1)]]

    def run(device):
        @pipeline_def(batch_size=2, num_threads=1, seed=1)
        def p():
            x = fn.external_source(source=lambda: vols, batch=True, layout="DHWC")
            if device == "gpu":
                x = x.gpu()
            return fn.pad(x, device=device, fill_value=7.0, align=[4, 4, 4],
                          axis_names="DHW")
        pipe = p()
        pipe.build()
        (out,) = pipe.run()
        return out

    cpu = run("cpu")
    gpu = run("gpu")
    dense = np.asarray(gpu.as_tensor())
    assert dense.shape == (2, 8, 8, 8, 1), dense.shape  # not the 64^3 canvas
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(cpu.at(i)), gpu.at(i))


def test_pad_gpu_as_tensor_extent_matches_cpu_2d():
    # 2-D regression for the same canvas-crop: HWC ragged batch padded to the
    # batch max must not leak staging-canvas quantization into as_tensor()
    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 255, (17, 23, 3), np.uint8),
            rng.integers(0, 255, (21, 19, 3), np.uint8)]

    @pipeline_def(batch_size=2, num_threads=1, seed=1)
    def p():
        x = fn.external_source(source=lambda: imgs, batch=True, layout="HWC")
        return fn.pad(x.gpu(), device="gpu")

    pipe = p()
    pipe.build()
    (out,) = pipe.run()
    assert np.asarray(out.as_tensor()).shape == (2, 21, 23, 3)


def test_pad_axis_names_after_mixed_decode(jpeg_dataset):
    # layout propagation through device-op chains: the decode output carries
    # HWC statically, so axis_names resolves on a device-to-device edge
    @pipeline_def(batch_size=4, num_threads=2, seed=7)
    def p():
        files, labels = fn.readers.file(file_root=jpeg_dataset,
                                        random_shuffle=True, seed=5)
        img = fn.decoders.image(files, device="mixed")
        return fn.pad(img, device="gpu", align=[16, 16], axis_names="HW"), labels

    pipe = p()
    pipe.build()
    padded, _ = pipe.run()
    dense = np.asarray(padded.as_tensor())
    shp = {padded.at(i).shape for i in range(4)}
    assert shp == {dense.shape[1:]}, (shp, dense.shape)
    assert dense.shape[1] % 16 == 0 and dense.shape[2] % 16 == 0


def test_rotate_volumetric_x_axis_mixes_depth():
    vol = np.zeros((7, 7, 5, 1), np.uint8)
    vol[1, 3, 2, 0] = 200
    out = _both(lambda x, d: fn.rotate(x, device=d, angle=90.0,
                                       axis=[1.0, 0.0, 0.0], keep_size=True,
                                       interp_type=types.INTERP_NN), vol)
    # the impulse moved out of its original depth slice
    assert out[1].sum() == 0 and out.sum() > 0
