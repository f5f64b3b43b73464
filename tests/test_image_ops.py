"""Color / warp / geometry operator tests: cpu↔gpu parity (the reference golden
pattern, ``test_utils.compare_pipelines``) and formula sanity."""

import numpy as np
import pytest

from dali_tpu import fn, pipeline_def, types


def _img_source(seed=0, n=4, h=32, w=48):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (n, h, w, 3), np.uint8)

    def cb():
        return data

    return cb, data


def run_pipe(build, batch_size=4):
    @pipeline_def(batch_size=batch_size, num_threads=2, seed=42)
    def pipe():
        return build()

    p = pipe()
    out = p.run()
    res = []
    for tl in out:
        if hasattr(tl, "as_cpu"):
            tl = tl.as_cpu()
        res.append(np.stack([tl.at(i) for i in range(len(tl))]))
    return res


def cpu_gpu_parity(op_fn, atol=1.5, **kwargs):
    cb, data = _img_source()

    def cpu_build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return op_fn(imgs, device="cpu", **kwargs)

    def gpu_build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return op_fn(imgs.gpu(), device="gpu", **kwargs)

    (cpu_out,) = run_pipe(cpu_build)
    (gpu_out,) = run_pipe(gpu_build)
    assert cpu_out.shape == gpu_out.shape
    np.testing.assert_allclose(
        cpu_out.astype(np.float32), gpu_out.astype(np.float32), atol=atol, rtol=0
    )
    return cpu_out


def test_brightness_contrast_parity():
    out = cpu_gpu_parity(fn.brightness_contrast, brightness=1.3, contrast=0.7, brightness_shift=0.1)
    cb, data = _img_source()
    expected = 0.1 * 255 + 1.3 * (127.5 + 0.7 * (data.astype(np.float32) - 127.5))
    np.testing.assert_allclose(out.astype(np.float32), np.clip(np.round(expected), 0, 255), atol=1)


def test_hsv_parity():
    cpu_gpu_parity(fn.hsv, hue=30.0, saturation=1.2, value=0.9, atol=2.0)


def test_color_twist_parity():
    cpu_gpu_parity(fn.color_twist, hue=45.0, saturation=0.8, brightness=1.1, contrast=1.2, atol=2.0)


def test_hsv_identity():
    cb, data = _img_source()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return fn.hsv(imgs.gpu(), hue=0.0, saturation=1.0, value=1.0)

    (out,) = run_pipe(build)
    np.testing.assert_allclose(out.astype(np.int32), data.astype(np.int32), atol=1)


def test_color_space_conversion_gray():
    cb, data = _img_source()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return fn.color_space_conversion(imgs, image_type=types.RGB, output_type=types.GRAY)

    (out,) = run_pipe(build)
    expected = np.round(
        data[..., 0] * 0.299 + data[..., 1] * 0.587 + data[..., 2] * 0.114
    )[..., None]
    np.testing.assert_allclose(out.astype(np.float32), expected, atol=1)


def test_warp_affine_identity():
    cb, data = _img_source()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return fn.warp_affine(imgs.gpu(), matrix=[1, 0, 0, 0, 1, 0])

    (out,) = run_pipe(build)
    np.testing.assert_array_equal(out, data)


def test_warp_affine_translate_parity():
    cpu_gpu_parity(fn.warp_affine, matrix=[1, 0, 5.0, 0, 1, 3.0], atol=1.5)


def test_rotate_90_exact():
    cb, data = _img_source(h=32, w=32)

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return fn.rotate(imgs.gpu(), angle=90.0, interp_type=types.INTERP_NN)

    (out,) = run_pipe(build)
    # 90° CCW rotation of a square image
    expected = np.rot90(data, k=1, axes=(1, 2))
    assert out.shape == expected.shape
    match = (out == expected).mean()
    assert match > 0.98, f"rot90 match ratio {match}"


def test_transforms_combine_rotation_translation():
    def build():
        t = fn.transforms.translation(offset=[2.0, 1.0])
        r = fn.transforms.rotation(angle=90.0)
        return fn.transforms.combine(r, t)

    (out,) = run_pipe(build)
    assert out.shape == (4, 2, 3)
    # translation applied after rotation: p' = T(R p)
    p = np.array([1.0, 0.0])
    m = out[0]
    res = m[:, :2] @ p + m[:, 2]
    np.testing.assert_allclose(res, [2.0, 2.0], atol=1e-5)


def test_flip_gpu():
    cb, data = _img_source()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        return fn.flip(imgs.gpu(), horizontal=1)

    (out,) = run_pipe(build)
    np.testing.assert_array_equal(out, data[:, :, ::-1])


def test_per_sample_tensor_arg():
    """brightness driven by fn.random.uniform — per-sample argument input path."""
    cb, data = _img_source()

    def build():
        imgs = fn.external_source(source=cb, batch=True, layout="HWC")
        b = fn.random.uniform(range=[0.5, 1.5])
        return fn.brightness(imgs.gpu(), brightness=b), b

    out, bvals = run_pipe(build)
    b = bvals.reshape(-1)
    assert len(np.unique(np.round(b, 4))) > 1  # actually per-sample
    expected = np.clip(np.round(127.5 * (1 - b[:, None, None, None]) + b[:, None, None, None] * data.astype(np.float32)), 0, 255)
    # brightness formula: shift*R + b*(center + 1*(x-center)) = b*x when shift=0... center cancels
    expected = np.clip(np.round(b[:, None, None, None] * data.astype(np.float32)), 0, 255)
    np.testing.assert_allclose(out.astype(np.float32), expected, atol=1.5)
