"""Pointwise color/intensity math shared by host (numpy) and device (jnp) paths.

Reference: ``dali/kernels/imgproc/pointwise/`` and
``dali/operators/image/color/`` — same formulas, written once against an ``xp``
array module so the cpu operator and the gpu lowering are literally the same code
(the fusion DALI does by hand falls out of XLA on the device side).

Conventions (match the reference):
* brightness/contrast: out = brightness_shift*R + brightness*(contrast_center +
  contrast*(in - contrast_center)), R = dtype range (brightness_contrast.cc).
* hue rotation operates in linear YIQ space (color_twist: hue matrix),
* saturation scales chroma in YIQ,
* grayscale/Y uses ITU-R BT.601 weights (color_space_conversion_impl.h).
"""

from __future__ import annotations

import math

import numpy as np

# ITU-R BT.601 (reference color_space_conversion_impl.h)
_Y_R, _Y_G, _Y_B = 0.299, 0.587, 0.114


def dtype_range(dtype) -> float:
    dt = np.dtype(dtype if not hasattr(dtype, "name") else dtype.name)
    if np.issubdtype(dt, np.integer):
        return float(np.iinfo(dt).max)
    return 1.0


def _rgb_to_yiq_mat():
    return np.array(
        [
            [0.299, 0.587, 0.114],
            [0.595716, -0.274453, -0.321263],
            [0.211456, -0.522591, 0.311135],
        ],
        np.float32,
    )


def _yiq_to_rgb_mat():
    return np.linalg.inv(_rgb_to_yiq_mat()).astype(np.float32)


def color_twist_matrix(hue_deg: float, saturation: float, value: float = 1.0) -> np.ndarray:
    """3x3 RGB matrix for hue rotation + saturation + value scaling, composed in
    YIQ space like the reference ColorTwist/Hsv GPU ops
    (``dali/operators/image/color/color_twist.h:37-76``)."""
    h = math.radians(hue_deg)
    c, s = math.cos(h), math.sin(h)
    hue_mat = np.array(
        [[1, 0, 0], [0, c, -s], [0, s, c]],
        np.float32,
    )
    sat_mat = np.diag([value, value * saturation, value * saturation]).astype(np.float32)
    return (_yiq_to_rgb_mat() @ sat_mat @ hue_mat @ _rgb_to_yiq_mat()).astype(np.float32)


def color_twist_matrices_batch(xp, hue_deg, saturation, value):
    """Per-sample [N,3,3] hue/sat/value matrices from (possibly traced) per-sample
    parameter vectors — the device-side version of :func:`color_twist_matrix`."""
    hue_deg = xp.asarray(hue_deg, xp.float32).reshape(-1)
    saturation = xp.asarray(saturation, xp.float32).reshape(-1)
    value = xp.asarray(value, xp.float32).reshape(-1)
    n = max(hue_deg.shape[0], saturation.shape[0], value.shape[0])
    h = hue_deg * (np.pi / 180.0)
    c, s = xp.cos(h), xp.sin(h)
    zeros = xp.zeros_like(c)
    ones = xp.ones_like(c)
    hue_mat = xp.stack(
        [
            xp.stack([ones, zeros, zeros], -1),
            xp.stack([zeros, c, -s], -1),
            xp.stack([zeros, s, c], -1),
        ],
        -2,
    )  # [N,3,3]
    sv = value[:, None] * xp.stack([xp.ones_like(saturation), saturation, saturation], -1)
    sat_mat = sv[:, :, None] * xp.asarray(np.eye(3, dtype=np.float32))
    to_yiq = xp.asarray(_rgb_to_yiq_mat())
    from_yiq = xp.asarray(_yiq_to_rgb_mat())
    return from_yiq @ (sat_mat @ (hue_mat @ to_yiq))


def apply_color_matrices_batch(xp, img, mats, offset=None):
    """img [N, ..., 3] × per-sample mats [N, 3, 3]."""
    out = xp.einsum("n...c,ndc->n...d", img, mats)
    if offset is not None:
        out = out + offset
    return out


def apply_color_matrix(xp, img, mat, offset=None):
    """img [..., 3] float; out = img @ mat.T (+ offset)."""
    out = xp.matmul(img, xp.asarray(mat.T, dtype=img.dtype))
    if offset is not None:
        out = out + xp.asarray(offset, dtype=img.dtype)
    return out


def saturate_cast(xp, x, dtype):
    dt = np.dtype(getattr(dtype, "name", None) or dtype)
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        x = xp.clip(xp.round(x), info.min, info.max)
    return x.astype(dtype)


def brightness_contrast(xp, img, brightness, brightness_shift, contrast, contrast_center, out_dtype):
    """Reference ``brightness_contrast.cc``: see module docstring formula."""
    r_out = dtype_range(out_dtype)
    x = img.astype(xp.float32)
    out = brightness_shift * r_out + brightness * (contrast_center + contrast * (x - contrast_center))
    return saturate_cast(xp, out, out_dtype)


def hsv_adjust(xp, img, hue_deg, saturation, value, out_dtype):
    """Reference ``hsv.cc``: hue/saturation/value via the YIQ matrix trick."""
    mat = color_twist_matrix(float(hue_deg), float(saturation), float(value))
    out = apply_color_matrix(xp, img.astype(xp.float32), mat)
    return saturate_cast(xp, out, out_dtype)


def color_twist(xp, img, hue_deg, saturation, brightness, contrast, out_dtype):
    """Reference ``color_twist.h``: hue+saturation matrix, then brightness mul and
    contrast around the half-range gray point."""
    r = dtype_range(out_dtype)
    mat = color_twist_matrix(float(hue_deg), float(saturation), 1.0)
    out = apply_color_matrix(xp, img.astype(xp.float32), mat)
    center = 0.5 * r
    out = brightness * (center + contrast * (out - center))
    return saturate_cast(xp, out, out_dtype)


def rgb_to_gray(xp, img, out_dtype):
    w = xp.asarray(np.array([_Y_R, _Y_G, _Y_B], np.float32))
    g = xp.sum(img.astype(xp.float32) * w, axis=-1, keepdims=True)
    return saturate_cast(xp, g, out_dtype)


_CSC_MATS = {}


def color_space_matrix(src: str, dst: str):
    """(mat, offset) pairs for uint8 full-range conversions, constants from the
    reference ``color_space_conversion_impl.h``."""
    key = (src, dst)
    if key in _CSC_MATS:
        return _CSC_MATS[key]
    I = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    # ITU-R BT.601 STUDIO swing (16..235 luma) — the ColorSpaceConversion op's
    # convention in the reference (itu_r_bt_601 in color_space_conversion_impl.h;
    # the full-range `jpeg` struct there is only used by JPEG decode).
    rgb2ycbcr = (
        np.array(
            [
                [0.25678823529, 0.50412941176, 0.09790588235],
                [-0.14822289945, -0.29099278682, 0.43921568627],
                [0.43921568627, -0.36778831435, -0.07142737192],
            ],
            np.float32,
        ),
        np.array([16, 128, 128], np.float32),
    )
    _y = 255.0 / 219
    ycbcr2rgb = (
        np.array(
            [[_y, 0, 1.5960267848], [_y, -0.39176228842, -0.81296764538], [_y, 2.0172321417, 0]],
            np.float32,
        ),
        np.array(
            [
                -16 * _y - 1.5960267848 * 128,
                -16 * _y + (0.39176228842 + 0.81296764538) * 128,
                -16 * _y - 2.0172321417 * 128,
            ],
            np.float32,
        ),
    )
    swap = (np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.float32), np.zeros(3, np.float32))
    table = {
        ("RGB", "RGB"): I,
        ("BGR", "BGR"): I,
        ("RGB", "YCbCr"): rgb2ycbcr,
        ("YCbCr", "RGB"): ycbcr2rgb,
        ("RGB", "BGR"): swap,
        ("BGR", "RGB"): swap,
    }
    if key in table:
        _CSC_MATS[key] = table[key]
        return table[key]
    # compose via RGB
    m1, o1 = color_space_matrix(src, "RGB")
    m2, o2 = color_space_matrix("RGB", dst)
    mat = (m2 @ m1).astype(np.float32)
    off = (m2 @ o1 + o2).astype(np.float32)
    _CSC_MATS[key] = (mat, off)
    return _CSC_MATS[key]


def convert_color_space(xp, img, src: str, dst: str, out_dtype):
    if dst == "GRAY":
        if src == "BGR":
            img = img[..., ::-1]
        elif src == "YCbCr":
            # studio-swing Y -> full-range gray (reference y_to_gray)
            y = (img[..., 0:1].astype(xp.float32) - 16.0) * (255.0 / 219.0)
            return saturate_cast(xp, y, out_dtype)
        return rgb_to_gray(xp, img, out_dtype)
    if src == "GRAY":
        rep = xp.concatenate([img.astype(xp.float32)] * 3, axis=-1)
        if dst == "YCbCr":
            mat, off = color_space_matrix("RGB", "YCbCr")
            return saturate_cast(xp, apply_color_matrix(xp, rep, mat, off), out_dtype)
        return saturate_cast(xp, rep, out_dtype)
    mat, off = color_space_matrix(src, dst)
    return saturate_cast(xp, apply_color_matrix(xp, img.astype(xp.float32), mat, off), out_dtype)
