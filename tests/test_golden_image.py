"""Independent-golden fidelity tests: dali_tpu ops vs cv2/scipy/numpy
implementations of the same math, with stated tolerances. Unlike the
cpu<->gpu self-parity suite (test_image_ops.py), a shared formula error in
this codebase FAILS here.

Golden pattern per reference dali/test/python/test_utils.py:252,366
(check_batch against library goldens with eps).
"""

import cv2
import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types

from .test_utils import to_samples


def imgs(n=4, h=57, w=63, seed=0, c=3):
    rng = np.random.default_rng(seed)
    smalls = [rng.integers(0, 256, (h // 4, w // 4, c), np.uint8) for _ in range(n)]
    return [cv2.resize(s, (w, h), interpolation=cv2.INTER_CUBIC).reshape(h, w, c)
            for s in smalls]


def run_op(samples, body, device):
    @pipeline_def(batch_size=len(samples), num_threads=1, seed=5)
    def pipe():
        x = fn.external_source(source=lambda: samples, batch=True, cycle=True)
        if device == "gpu":
            x = x.gpu()
        return body(x)

    p = pipe()
    p.build()
    return to_samples(p.run()[0])


DEVICES = ("cpu", "gpu")


@pytest.mark.parametrize("device", DEVICES)
def test_flip_vs_numpy(device):
    src = imgs()
    out = run_op(src, lambda x: fn.flip(x, horizontal=1, vertical=1), device)
    for s, o in zip(src, out):
        np.testing.assert_array_equal(o, s[::-1, ::-1])


@pytest.mark.parametrize("device", DEVICES)
def test_resize_linear_upscale_vs_cv2(device):
    src = imgs(h=40, w=46)
    out = run_op(src, lambda x: fn.resize(x, resize_x=92, resize_y=80,
                                          interp_type=types.INTERP_LINEAR,
                                          antialias=False), device)
    for s, o in zip(src, out):
        g = cv2.resize(s, (92, 80), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= 2 and (diff > 1).mean() < 0.01, diff.max()


def _tent_downscale_2x(img):
    """Separable triangular (tent) filter at scale 2, DALI convention:
    radius = scale, taps at |d| < 2 source pixels around the projected center
    (resampling_windows.h TriangularFilter(radius=scale))."""
    f = img.astype(np.float64)
    for axis in (0, 1):
        n_out = f.shape[axis] // 2
        src_c = (np.arange(n_out) + 0.5) * 2 - 0.5  # projected centers
        idx = np.arange(f.shape[axis])
        w = np.maximum(0.0, 1.0 - np.abs(idx[None, :] - src_c[:, None]) / 2.0)
        w /= w.sum(1, keepdims=True)
        f = np.tensordot(w, f, axes=(1, axis))
        f = np.moveaxis(f, 0, axis)
    return f


@pytest.mark.parametrize("device", DEVICES)
def test_resize_triangular_downscale_vs_tent_golden(device):
    # independent numpy tent-filter golden (a box-filter INTER_AREA golden
    # would conflate two legitimately different algorithms)
    src = imgs(h=64, w=64)
    out = run_op(src, lambda x: fn.resize(x, resize_x=32, resize_y=32,
                                          interp_type=types.INTERP_TRIANGULAR,
                                          antialias=True), device)
    for s, o in zip(src, out):
        g = np.clip(np.round(_tent_downscale_2x(s)), 0, 255).astype(np.int32)
        diff = np.abs(o.astype(np.int32) - g)
        assert diff.max() <= 2 and diff.mean() < 0.2, (diff.mean(), diff.max())
        # and stays in the neighborhood of cv2 INTER_AREA (loose sanity:
        # tent vs box filter differ by a few LSB on high-frequency content)
        area = cv2.resize(s, (32, 32), interpolation=cv2.INTER_AREA).astype(np.int32)
        assert np.abs(o.astype(np.int32) - area).mean() < 8.0


@pytest.mark.parametrize("device", DEVICES)
def test_gaussian_blur_vs_scipy(device):
    from scipy.ndimage import gaussian_filter

    src = imgs()
    sigma = 1.4
    out = run_op(src, lambda x: fn.gaussian_blur(x, sigma=sigma), device)
    for s, o in zip(src, out):
        g = np.stack(
            [gaussian_filter(s[..., ch].astype(np.float32), sigma, mode="mirror",
                             truncate=3.0) for ch in range(3)], -1)
        g = np.clip(np.round(g), 0, 255).astype(np.uint8)
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= 2 and diff.mean() < 0.2, (diff.max(), diff.mean())


@pytest.mark.parametrize("device", DEVICES)
def test_laplacian_vs_cv2(device):
    src = imgs()
    out = run_op(src, lambda x: fn.laplacian(x, window_size=3,
                                             dtype=types.FLOAT), device)
    for s, o in zip(src, out):
        g = np.stack([cv2.Laplacian(s[..., ch], cv2.CV_32F, ksize=3,
                                    borderType=cv2.BORDER_REFLECT_101)
                      for ch in range(3)], -1)
        np.testing.assert_allclose(o, g, atol=1e-2)


@pytest.mark.parametrize("device", DEVICES)
def test_warp_affine_vs_cv2(device):
    src = imgs(h=60, w=60)
    # dst->src map (inverse_map=True, both frameworks' inverse convention)
    m = np.array([[0.9, 0.1, 2.0], [-0.08, 1.05, -1.5]], np.float32)
    out = run_op(src, lambda x: fn.warp_affine(x, matrix=list(m.ravel()),
                                               interp_type=types.INTERP_LINEAR,
                                               fill_value=0.0), device)
    for s, o in zip(src, out):
        g = cv2.warpAffine(s, m, (60, 60),
                           flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        # cv2 uses 5-bit fixed-point interpolation weights; allow its quantum
        assert (diff > 4).mean() < 0.02 and diff.mean() < 1.0, (
            diff.mean(), (diff > 4).mean())


@pytest.mark.parametrize("device", DEVICES)
def test_rotate_90_exact(device):
    src = imgs()
    out = run_op(src, lambda x: fn.rotate(x, angle=90.0,
                                          interp_type=types.INTERP_NN), device)
    for s, o in zip(src, out):
        g = np.rot90(s, 1)  # 90deg CCW... DALI rotates counterclockwise
        alt = np.rot90(s, -1)
        match = min(np.abs(o.astype(int) - g.astype(int)).mean(),
                    np.abs(o.astype(int) - alt.astype(int)).mean())
        assert o.shape == g.shape
        assert match < 0.5, match


@pytest.mark.parametrize("device", DEVICES)
def test_color_space_rgb_to_gray_vs_cv2(device):
    src = imgs()
    out = run_op(src, lambda x: fn.color_space_conversion(
        x, image_type=types.RGB, output_type=types.GRAY), device)
    for s, o in zip(src, out):
        g = cv2.cvtColor(s, cv2.COLOR_RGB2GRAY)[..., None]
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("device", DEVICES)
def test_color_space_rgb_to_ycbcr_vs_formula(device):
    src = imgs()
    out = run_op(src, lambda x: fn.color_space_conversion(
        x, image_type=types.RGB, output_type=types.YCbCr), device)
    for s, o in zip(src, out):
        f = s.astype(np.float32)
        # ITU-R BT.601 with 16..235 luma range (the JPEG/DALI convention uses
        # full-range? reference uses ITU-R BT.601 studio swing for YCbCr op)
        y = 0.257 * f[..., 0] + 0.504 * f[..., 1] + 0.098 * f[..., 2] + 16
        cb = -0.148 * f[..., 0] - 0.291 * f[..., 1] + 0.439 * f[..., 2] + 128
        cr = 0.439 * f[..., 0] - 0.368 * f[..., 1] - 0.071 * f[..., 2] + 128
        g = np.clip(np.round(np.stack([y, cb, cr], -1)), 0, 255)
        diff = np.abs(o.astype(np.float32) - g)
        assert diff.max() <= 2.0, diff.max()


@pytest.mark.parametrize("device", DEVICES)
def test_brightness_contrast_vs_formula(device):
    src = imgs()
    out = run_op(src, lambda x: fn.brightness_contrast(
        x, brightness=1.2, contrast=0.8), device)
    for s, o in zip(src, out):
        g = np.clip(np.round(1.2 * (0.5 * 255 + 0.8 * (s.astype(np.float32) - 0.5 * 255))),
                    0, 255).astype(np.uint8)
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("device", DEVICES)
def test_crop_mirror_normalize_vs_numpy(device):
    src = imgs(h=50, w=50)
    mean = [100.0, 120.0, 140.0]
    std = [50.0, 60.0, 70.0]
    out = run_op(src, lambda x: fn.crop_mirror_normalize(
        x, crop=(32, 32), mean=mean, std=std, mirror=1,
        dtype=types.FLOAT, output_layout="CHW"), device)
    for s, o in zip(src, out):
        y0, x0 = (50 - 32) // 2, (50 - 32) // 2
        crop = s[y0:y0 + 32, x0:x0 + 32].astype(np.float32)[:, ::-1]
        g = (crop - np.array(mean)) / np.array(std)
        g = g.transpose(2, 0, 1)
        np.testing.assert_allclose(o, g, atol=1e-4)


@pytest.mark.parametrize("device", DEVICES)
def test_pad_vs_numpy(device):
    rng = np.random.default_rng(1)
    src = [rng.integers(0, 255, (s, 3), np.uint8) for s in (7, 11, 5, 9)]
    out = run_op(src, lambda x: fn.pad(x, fill_value=7, axes=[0]), device)
    for s, o in zip(src, out):
        g = np.pad(s, ((0, 11 - s.shape[0]), (0, 0)), constant_values=7)
        np.testing.assert_array_equal(o, g)


@pytest.mark.parametrize("device", DEVICES)
def test_erase_vs_numpy(device):
    src = imgs(h=40, w=40)
    out = run_op(src, lambda x: fn.erase(x, anchor=[5.0, 6.0], shape=[10.0, 12.0],
                                         axes=[0, 1], fill_value=0.0), device)
    # axis_names spelling needs an input layout (reference TensorLayout
    # resolution) — equivalence with the axes spelling is covered in
    # tests/test_axis_names.py
    for s, o in zip(src, out):
        g = s.copy()
        g[5:15, 6:18] = 0
        np.testing.assert_array_equal(o, g)


@pytest.mark.parametrize("device", DEVICES)
def test_transpose_vs_numpy(device):
    src = imgs()
    out = run_op(src, lambda x: fn.transpose(x, perm=[2, 0, 1]), device)
    for s, o in zip(src, out):
        np.testing.assert_array_equal(o, s.transpose(2, 0, 1))


def test_jpeg_full_decode_vs_cv2():
    # full host decode path (not hybrid): byte-exact against cv2's libjpeg
    src = imgs(h=50, w=70)
    files = [cv2.imencode(".jpg", s[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])[1]
             .tobytes() for s in src]

    @pipeline_def(batch_size=4, num_threads=1, seed=5)
    def pipe():
        data = fn.external_source(
            source=lambda: [np.frombuffer(f, np.uint8) for f in files],
            batch=True, cycle=True)
        return fn.decoders.image(data, device="cpu", output_type=types.RGB)

    p = pipe()
    p.build()
    out = to_samples(p.run()[0])
    for f, o in zip(files, out):
        g = cv2.imdecode(np.frombuffer(f, np.uint8), cv2.IMREAD_COLOR)[..., ::-1]
        diff = np.abs(o.astype(np.int32) - g.astype(np.int32))
        assert diff.max() <= 1, diff.max()  # IDCT rounding only


@pytest.mark.parametrize("device", DEVICES)
def test_reductions_vs_numpy(device):
    rng = np.random.default_rng(2)
    src = [rng.standard_normal((9, 13)).astype(np.float32) for _ in range(3)]

    def body(x):
        return fn.reductions.mean(x, axes=[0, 1])

    out = run_op(src, body, device)
    for s, o in zip(src, out):
        np.testing.assert_allclose(np.asarray(o), s.mean(), rtol=1e-5)


@pytest.mark.parametrize("device", DEVICES)
def test_normalize_vs_numpy(device):
    rng = np.random.default_rng(3)
    src = [rng.standard_normal((20, 8)).astype(np.float32) * 3 + 1 for _ in range(3)]
    out = run_op(src, lambda x: fn.normalize(x, axes=[0]), device)
    for s, o in zip(src, out):
        g = (s - s.mean(0)) / s.std(0)
        np.testing.assert_allclose(o, g, atol=2e-3)
