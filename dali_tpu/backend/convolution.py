"""Convolution-based filters: GaussianBlur, Laplacian, generic Filter.

Reference: ``dali/operators/image/convolution/`` (gaussian_blur.cc, laplacian.cc,
filter.cc) over ``dali/kernels/imgproc/convolution/``. Device path: separable
depthwise convolution via ``lax.conv_general_dilated`` (XLA picks MXU-friendly
lowering); window coefficients match the reference (OpenCV-compatible Gaussian,
binomial Laplacian windows).
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch
from ..types import DALIDataType, to_jnp_type, to_numpy_type
from .base import Operator


def gaussian_window(size: int, sigma: float) -> np.ndarray:
    """OpenCV-compatible Gaussian kernel (reference gaussian_blur_params.h)."""
    if size <= 0:
        size = max(3, int(2 * np.ceil(3 * sigma) + 1))
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float64) - (size - 1) * 0.5
    w = np.exp(-(x**2) / (2 * sigma**2))
    return (w / w.sum()).astype(np.float32), size, sigma


DALI_SCHEMA("GaussianBlur").DocStr(
    "Separable Gaussian blur (reference image/convolution/gaussian_blur.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "sigma", ArgType.FLOAT_VEC, "Gaussian sigma per axis.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "window_size", ArgType.INT_VEC, "Window size per axis.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)


def _blur_params(spec, ctx, op, idx):
    sigma = ctx.arg(op, "sigma", idx, None)
    win = ctx.arg(op, "window_size", idx, None)
    s = float(np.asarray(sigma).reshape(-1)[0]) if sigma is not None else 0.0
    w = int(np.asarray(win).reshape(-1)[0]) if win is not None else 0
    if s <= 0 and w <= 0:
        w = 3
    return s, w


@register_operator("GaussianBlur", "cpu")
class GaussianBlurCPU(Operator):
    def run_sample(self, ctx, idx, img):
        import cv2

        s, w = _blur_params(self.spec, ctx, self, idx)
        kernel, size, sigma = gaussian_window(w, s)
        out = cv2.GaussianBlur(img, (size, size), sigmaX=sigma, borderType=cv2.BORDER_REFLECT_101)
        out = out[:, :, None] if out.ndim == 2 and img.ndim == 3 else out
        dt = self.spec.GetArgument("dtype", None)
        return out.astype(to_numpy_type(dt)) if dt is not None else out


def _separable_conv2d(data, ky, kx):
    """Depthwise separable 2D convolution on [N, H, W, C] with reflect-101 border."""
    import jax.numpy as jnp
    from jax import lax

    n, H, W, C = data.shape
    x = data.astype(jnp.float32)
    ry, rx = len(ky) // 2, len(kx) // 2
    x = jnp.pad(x, ((0, 0), (ry, ry), (0, 0), (0, 0)), mode="reflect")
    # depthwise: rhs is [H, W, I=1, O=C] with feature_group_count=C
    kyv = jnp.broadcast_to(jnp.asarray(ky, jnp.float32).reshape(-1, 1, 1, 1), (len(ky), 1, 1, C))
    x = lax.conv_general_dilated(
        x, kyv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (rx, rx), (0, 0)), mode="reflect")
    kxv = jnp.broadcast_to(jnp.asarray(kx, jnp.float32).reshape(1, -1, 1, 1), (1, len(kx), 1, C))
    x = lax.conv_general_dilated(
        x, kxv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return x


def _saturate(xp, out, dtype):
    import jax.numpy as jnp

    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        out = xp.clip(xp.round(out), info.min, info.max)
    return out.astype(dtype)


@register_operator("GaussianBlur", "gpu")
class GaussianBlurGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        sigma = self.spec.GetArgument("sigma", None)
        win = self.spec.GetArgument("window_size", None)
        s = float(np.asarray(sigma).reshape(-1)[0]) if sigma else 0.0
        w = int(np.asarray(win).reshape(-1)[0]) if win else 0
        if s <= 0 and w <= 0:
            w = 3
        kernel, size, sig = gaussian_window(w, s)
        out = _separable_conv2d(inp.data, kernel, kernel)
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
        return [inp.with_data(_saturate(jnp, out, dt))]


# ======================================== Laplacian =================================================

DALI_SCHEMA("Laplacian").DocStr(
    "Laplacian filter (reference image/convolution/laplacian.cc): sum of second "
    "derivatives computed with separable derivative/smoothing windows."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "window_size", ArgType.INT_VEC, "Derivative window size.", [3]
).AddOptionalArg(
    "scale", ArgType.FLOAT_VEC, "Output scale.", [1.0]
).AddOptionalArg(
    "normalized_kernel", ArgType.BOOL, "Normalize windows to unit gain.", False
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)


def laplacian_windows(size: int):
    """Derivative + smoothing windows for an odd window size (reference
    ``laplacian_params.cc``): derivative = [1,-2,1] ⊛ binomial(size-3),
    smoothing = binomial(size-1) — OpenCV Sobel-compatible."""
    deriv = np.array([1.0, -2.0, 1.0], np.float32)
    for _ in range((size - 3) // 2):
        deriv = np.convolve(deriv, [1.0, 2.0, 1.0]).astype(np.float32)
    smooth = np.array([1.0], np.float32)
    for _ in range((size - 1) // 2):
        smooth = np.convolve(smooth, [1.0, 2.0, 1.0]).astype(np.float32)
    return deriv, smooth


def _laplacian_scale(spec, size, ndim=2):
    """Effective scale: `scale`, or 2^(-s + n + 2) when normalized_kernel=True
    (reference laplacian.cc:62 — s = sum of window sizes per partial
    derivative, n = number of axes)."""
    if spec.GetArgument("normalized_kernel", False):
        return 2.0 ** (-(size * ndim) + ndim + 2)
    return float(spec.GetArgument("scale", [1.0])[0])


@register_operator("Laplacian", "cpu")
class LaplacianCPU(Operator):
    def run_sample(self, ctx, idx, img):
        import cv2

        size = int(self.spec.GetArgument("window_size", [3])[0])
        scale = _laplacian_scale(self.spec, size)
        out = cv2.Laplacian(img.astype(np.float32), cv2.CV_32F, ksize=size, scale=scale,
                            borderType=cv2.BORDER_REFLECT_101)
        out = out[:, :, None] if out.ndim == 2 and img.ndim == 3 else out
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else np.dtype(np.float32)
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(dt)


@register_operator("Laplacian", "gpu")
class LaplacianGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        size = int(self.spec.GetArgument("window_size", [3])[0])
        scale = _laplacian_scale(self.spec, size)
        deriv, smooth = laplacian_windows(size)
        # Laplacian = d²/dy² (smoothed in x) + d²/dx² (smoothed in y)
        dyy = _separable_conv2d(inp.data, deriv, smooth)
        dxx = _separable_conv2d(inp.data, smooth, deriv)
        out = (dyy + dxx) * scale
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_jnp_type(dt_arg) if dt_arg is not None else jnp.float32
        return [inp.with_data(_saturate(jnp, out, dt))]


# ======================================== Filter ====================================================

DALI_SCHEMA("experimental.Filter").DocStr(
    "General 2D correlation with a per-sample kernel (reference image/filter/filter.cc)."
).NumInput(2, 3).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "anchor", ArgType.INT_VEC, "Kernel anchor (default center).", None
).AddOptionalArg(
    "border", ArgType.STRING, '"reflect_101", "constant", ...', "reflect_101"
).AddOptionalArg(
    "mode", ArgType.STRING, '"same" or "valid".', "same"
).AddOptionalArg("fill_value", ArgType.FLOAT, "Constant-border fill.", 0.0).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
)


@register_operator("experimental.Filter", "cpu")
class FilterCPU(Operator):
    def run_sample(self, ctx, idx, img, kernel, *fill):
        import cv2

        border = {"reflect_101": cv2.BORDER_REFLECT_101, "constant": cv2.BORDER_CONSTANT,
                  "reflect": cv2.BORDER_REFLECT, "replicate": cv2.BORDER_REPLICATE,
                  "wrap": cv2.BORDER_WRAP}[self.spec.GetArgument("border", "reflect_101")]
        out = cv2.filter2D(img.astype(np.float32), -1, np.asarray(kernel, np.float32),
                           borderType=border)
        out = out[:, :, None] if out.ndim == 2 and img.ndim == 3 else out
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else img.dtype
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(dt)
