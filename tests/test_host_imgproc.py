"""Own-code cpu image kernels (host_ops.cc) — golden tests (VERDICT r3 #6).

The cpu sides of MedianBlur / Erode / Dilate / CLAHE and the antialiased
INTER_AREA downscale used to delegate to OpenCV; these tests pin the
from-scratch replacements: bit-exact vs cv2 where the math is discrete
(median, morphology), stated tolerances where float rounding differs
(CLAHE redistribution, area resize), and cpu==gpu agreement through the
public fn API.
"""

import numpy as np
import pytest

from dali_tpu import fn, native, pipeline_def

cv2 = pytest.importorskip("cv2")

if not (native.available() and native.has_host_imgproc()):
    pytest.skip("native host imgproc kernels unavailable", allow_module_level=True)


def _img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, c), np.uint8)
    # add structure: gradients + flat patches exercise histogram edges
    yy, xx = np.mgrid[0:h, 0:w]
    base[..., 0] = ((base[..., 0] // 2) + (yy * 255 // max(h - 1, 1)) // 2).astype(np.uint8)
    base[h // 4 : h // 2, w // 4 : w // 2] = 128
    return base


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("c", [1, 3])
def test_median_matches_cv2_bitexact(k, c):
    img = _img(41, 57, c, k * 10 + c)
    got = native.median_blur_u8(img, k)
    want = cv2.medianBlur(img, k)
    if want.ndim == 2:
        want = want[:, :, None]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mh,mw", [(3, 3), (1, 5), (5, 1), (5, 3)])
@pytest.mark.parametrize("dilate", [False, True])
@pytest.mark.parametrize("iters", [1, 2])
def test_morph_matches_cv2_bitexact(mh, mw, dilate, iters):
    img = _img(37, 49, 3, mh * 100 + mw + iters)
    got = native.morph_u8(img, mh, mw, -1, -1, iters, dilate, replicate=True)
    kernel = np.ones((mh, mw), np.uint8)
    fn_cv = cv2.dilate if dilate else cv2.erode
    want = fn_cv(img, kernel, iterations=iters, borderType=cv2.BORDER_REPLICATE)
    if want.ndim == 2:
        want = want[:, :, None]
    np.testing.assert_array_equal(got, want)


def test_morph_constant_border_identity():
    # constant border = reduction identity: for full-ones kernels this equals
    # clamping the window to the image (outside pixels never win)
    img = _img(20, 24, 1, 5)
    got = native.morph_u8(img, 3, 3, -1, -1, 1, True, replicate=False)
    want = cv2.dilate(img, np.ones((3, 3), np.uint8),
                      borderType=cv2.BORDER_CONSTANT,
                      borderValue=0)  # identity for uint8 dilate
    if want.ndim == 2:
        want = want[:, :, None]
    np.testing.assert_array_equal(got, want)


def test_clahe_single_plane_near_cv2():
    """Stated tolerance vs cv2 (docs/compatibility.md): the framework's CLAHE
    anchors the LUT at the tile's minimum CDF (classic Zuiderveld CLAHE) and
    redistributes clipped excess uniformly in float, while cv2 keeps the raw
    CDF and an integer remainder loop — a few-level systematic offset, not
    noise. cpu==gpu agreement (next test) is the bit-control contract."""
    img = _img(64, 80, 1, 9)[..., 0]
    got = native.clahe_f32(img.astype(np.float32), 2.0, 8, 8, 256)
    got = np.clip(np.round(got), 0, 255).astype(np.uint8)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() <= 4.0, diff.mean()
    assert diff.max() <= 16, diff.max()
    # both must actually equalize: higher entropy than input locally
    assert got.std() > 0


def _run_both(make_pipe):
    outs = {}
    for device in ("cpu", "gpu"):
        pipe = make_pipe(device)
        pipe.build()
        (out,) = pipe.run()
        outs[device] = np.asarray(out.at(0) if device == "cpu" else out.as_tensor())[
            0 if device == "gpu" else slice(None)
        ]
    return outs["cpu"], outs["gpu"]


@pytest.mark.parametrize("op,kwargs", [
    ("median_blur", {"window_size": 5}),
    ("erode", {"mask_size": [3, 3]}),
    ("dilate", {"mask_size": [5, 3]}),
])
def test_cpu_gpu_agree_through_fn(op, kwargs):
    img = _img(40, 52, 3, 77)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=3)
        def p():
            x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
            x = x.gpu() if device == "gpu" else x
            f = getattr(fn.experimental, op)
            return f(x, device=device, **kwargs)

        return p()

    a, b = _run_both(make)
    np.testing.assert_array_equal(a, b)


def test_clahe_cpu_matches_gpu_lowering():
    """cpu CLAHE mirrors ClaheGPU's math operation-for-operation; XLA's fma
    contraction can move the final bilinear mix by one rounding step."""
    img = _img(48, 64, 3, 21)

    def make(device):
        @pipeline_def(batch_size=1, num_threads=1, seed=3)
        def p():
            x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
            x = x.gpu() if device == "gpu" else x
            return fn.experimental.clahe(x, device=device, clip_limit=3.0)

        return p()

    a, b = _run_both(make)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("shape,out", [((100, 140), (50, 70)),
                                       ((97, 133), (41, 59)),
                                       ((64, 64), (48, 48))])
def test_resize_area_near_cv2(shape, out):
    img = _img(shape[0], shape[1], 3, shape[0])
    got = native.resize_area_u8(img, out[0], out[1])
    want = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_AREA)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()  # float accumulation order only


# ===================== own-code cpu convolution (VERDICT r3 #4) ==============
# GaussianBlur / Laplacian / generic Filter cpu previously delegated to
# cv2.GaussianBlur/Laplacian/filter2D; these pin the native separable and
# general 2-D correlation kernels (host_ops.cc dali_tpu_sep_conv_f32 /
# dali_tpu_filter2d_f32; reference convolution_cpu.h, baseline_convolution.h).


@pytest.mark.parametrize("size,sigma", [(3, 0.8), (5, 1.4), (11, 2.5), (41, 7.0)])
def test_sep_conv_matches_cv2(size, sigma):
    img = _img(37, 53, 3, size).astype(np.float32)
    k = cv2.getGaussianKernel(size, sigma).astype(np.float32).ravel()
    got = native.sep_conv_f32(img, k, k)
    want = cv2.sepFilter2D(img, -1, k, k, borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(got - want).max() < 1e-3  # float accumulation order only


def test_sep_conv_kernel_wider_than_image():
    # multi-bounce reflect-101 (kernel spans the image several times)
    img = _img(3, 4, 3, 9).astype(np.float32)
    k = cv2.getGaussianKernel(9, 2.0).astype(np.float32).ravel()
    got = native.sep_conv_f32(img, k, k)
    want = cv2.sepFilter2D(img, -1, k, k, borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(got - want).max() < 1e-3


@pytest.mark.parametrize("border", ["reflect_101", "reflect", "replicate",
                                    "wrap", "constant"])
def test_filter2d_borders_match_cv2(border):
    img = _img(37, 53, 3, 7).astype(np.float32)
    rng = np.random.default_rng(5)
    kern = rng.normal(size=(5, 7)).astype(np.float32)
    got = native.filter2d_f32(img, kern, border=border, fill=3.5)
    if border in ("wrap", "constant"):  # cv2.filter2D can't do BORDER_WRAP
        kw = {"mode": "wrap"} if border == "wrap" else \
            {"mode": "constant", "constant_values": 3.5}
        padded = np.pad(img, ((2, 2), (3, 3), (0, 0)), **kw)
        want = cv2.filter2D(padded, -1, kern,
                            borderType=cv2.BORDER_REPLICATE)[2:-2, 3:-3]
    else:
        code = {"reflect_101": cv2.BORDER_REFLECT_101,
                "reflect": cv2.BORDER_REFLECT,
                "replicate": cv2.BORDER_REPLICATE}[border]
        want = cv2.filter2D(img, -1, kern, borderType=code)
    assert np.abs(got - want).max() < 5e-2, border


def test_filter2d_anchor_matches_cv2():
    img = _img(30, 31, 1, 3).astype(np.float32)
    kern = np.random.default_rng(2).normal(size=(4, 3)).astype(np.float32)
    got = native.filter2d_f32(img, kern, anchor_y=0, anchor_x=1)
    want = cv2.filter2D(img, -1, kern, anchor=(1, 0),
                        borderType=cv2.BORDER_REFLECT_101)[..., None]
    assert np.abs(got - want).max() < 5e-2


def test_fn_filter_valid_mode_shape_and_values():
    img = _img(20, 24, 3, 11)
    kern = (np.ones((3, 5), np.float32) / 15.0)

    @pipeline_def(batch_size=1, num_threads=1, seed=0)
    def p():
        x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
        k = fn.external_source(source=lambda: [kern], batch=True)
        return fn.experimental.filter(x, k, mode="valid")

    pipe = p()
    pipe.build()
    (out,) = pipe.run()
    got = np.asarray(out[0])
    assert got.shape == (18, 20, 3)
    want = cv2.filter2D(img.astype(np.float32), -1, kern,
                        borderType=cv2.BORDER_REFLECT_101)[1:-1, 2:-2]
    dt = np.abs(got.astype(np.float32) - np.clip(np.round(want), 0, 255))
    assert dt.max() <= 1


def test_fn_filter_valid_mode_kernel_too_big_errors():
    """mode='valid' with a kernel that doesn't fit inside the input has no
    valid window: the op must error loudly, not emit a negative-slice crop
    of border math (review r4)."""
    img = _img(4, 4, 3, 12)
    kern = np.ones((6, 6), np.float32) / 36.0

    @pipeline_def(batch_size=1, num_threads=1, seed=0)
    def p():
        x = fn.external_source(source=lambda: [img], batch=True, layout="HWC")
        k = fn.external_source(source=lambda: [kern], batch=True)
        return fn.experimental.filter(x, k, mode="valid")

    pipe = p()
    pipe.build()
    with pytest.raises(Exception, match="does not fit"):
        pipe.run()
