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


def _blur_params(spec, ctx, op, idx, naxes=1):
    """Per-axis (sigma, window) pairs; scalars broadcast across axes
    (reference gaussian_blur_params.h per-axis windows)."""
    sigma = ctx.arg(op, "sigma", idx, None)
    win = ctx.arg(op, "window_size", idx, None)
    sv = np.asarray(sigma, np.float64).reshape(-1) if sigma is not None else np.zeros(1)
    wv = np.asarray(win, np.int64).reshape(-1) if win is not None else np.zeros(1, np.int64)
    out = []
    for a in range(naxes):
        s = float(sv[a % len(sv)])
        w = int(wv[a % len(wv)])
        if s <= 0 and w <= 0:
            w = 3
        out.append((s, w))
    return out if naxes > 1 else out[0]


@register_operator("GaussianBlur", "cpu")
class GaussianBlurCPU(Operator):
    def run_batch(self, ctx, *inputs):
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, img):
        if img.ndim == 4 and getattr(self, "_in_layout", "").startswith("F"):
            # FHWC sequence: per-frame 2-D blur (reference sequence fold),
            # NOT a 3-axis volumetric blur across frames
            return np.stack([self.run_sample(ctx, idx, fr) for fr in img])
        if img.ndim == 4:  # DHWC volumetric (2-D images arrive as HWC)
            # volumetric (DHWC): own separable conv, reflect-101 on D/H/W
            params = _blur_params(self.spec, ctx, self, idx, naxes=3)
            out = img
            for axis, (s, w) in enumerate(params):
                kernel, _, _ = gaussian_window(w, s)
                out = _conv1d_reflect_np(out, kernel, axis)
            dt_arg = self.spec.GetArgument("dtype", None)
            dt = to_numpy_type(dt_arg) if dt_arg is not None else img.dtype
            if np.issubdtype(dt, np.integer):
                info = np.iinfo(dt)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(dt)
        s, w = _blur_params(self.spec, ctx, self, idx)
        kernel, size, sigma = gaussian_window(w, s)
        out = _sep_conv2d_host(img, kernel, kernel)
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else img.dtype
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(dt)


def _sep_conv2d_host(img, ky, kx):
    """Own-code separable 2-D correlation with reflect-101 border on the
    leading two axes of an HWC (or HW) sample — the native kernel
    (host_ops.cc ``dali_tpu_sep_conv_f32``, reference
    ``dali/kernels/imgproc/convolution/convolution_cpu.h``) with a numpy
    fallback for native-less installs. Returns float32."""
    from .. import native

    if native.available() and hasattr(native._load(), "dali_tpu_sep_conv_f32"):
        return native.sep_conv_f32(img, ky, kx)
    out = _conv1d_reflect_np(img, ky, 0)
    return _conv1d_reflect_np(out, kx, 1)


_BORDER_NP = {"reflect_101": "reflect", "reflect": "symmetric", "wrap": "wrap",
              "replicate": "edge", "constant": "constant"}


def _filter2d_host(img, kernel, border="reflect_101", fill=0.0,
                   anchor_y=-1, anchor_x=-1):
    """Own-code general 2-D correlation (host_ops.cc
    ``dali_tpu_filter2d_f32``, reference
    ``dali/kernels/imgproc/convolution/baseline_convolution.h``; formerly
    cv2.filter2D) with a numpy fallback. Returns float32, same rank as
    input."""
    from .. import native

    if native.available() and hasattr(native._load(), "dali_tpu_filter2d_f32"):
        return native.filter2d_f32(img, kernel, border=border, fill=fill,
                                   anchor_y=anchor_y, anchor_x=anchor_x)
    kh, kw = kernel.shape
    ay = kh // 2 if anchor_y < 0 else anchor_y
    ax = kw // 2 if anchor_x < 0 else anchor_x
    pads = [(ay, kh - 1 - ay), (ax, kw - 1 - ax)] + [(0, 0)] * (img.ndim - 2)
    kw_np = {"mode": _BORDER_NP[border]}
    if border == "constant":
        kw_np["constant_values"] = fill
    xp = np.pad(img.astype(np.float32), pads, **kw_np)
    out = np.zeros(img.shape, np.float32)
    for i in range(kh):
        for j in range(kw):
            sl = (slice(i, i + img.shape[0]), slice(j, j + img.shape[1]))
            out += float(kernel[i, j]) * xp[sl]
    return out


def _conv1d_reflect_np(x, k, axis):
    """Own-code 1-D correlation along ``axis`` with reflect-101 border
    (numpy; volumetric cpu path — no cv2 3-D analogue exists)."""
    r = len(k) // 2
    pads = [(r, r) if a == axis else (0, 0) for a in range(x.ndim)]
    xp = np.pad(x.astype(np.float32), pads, mode="reflect")
    out = np.zeros(x.shape, np.float32)
    sl = [slice(None)] * x.ndim
    for t, kv in enumerate(np.asarray(k, np.float32)):
        sl[axis] = slice(t, t + x.shape[axis])
        out += kv * xp[tuple(sl)]
    return out


def _conv1d_reflect_jnp(x, k, axis):
    """1-D depthwise correlation along a spatial ``axis`` of [N, ..., C]
    with reflect-101 border (shifted-slice accumulation: XLA fuses the adds;
    for the short Gaussian/Laplacian windows this beats reshaping volumes
    through conv_general_dilated)."""
    import jax.numpy as jnp

    r = len(k) // 2
    pads = [(r, r) if a == axis else (0, 0) for a in range(x.ndim)]
    xp = jnp.pad(x.astype(jnp.float32), pads, mode="reflect")
    out = None
    for t, kv in enumerate(np.asarray(k, np.float32)):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + x.shape[axis])
        term = float(kv) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


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


def _blur_axis_jnp(img, w, ext, axis):
    """1-D correlation along ``axis`` of one sample with reflect-101 border
    bounded by the per-sample ``ext`` (NOT the canvas edge — ragged batches
    must never blur canvas padding into the image). ``w`` is a traced [K]
    center-aligned kernel (zero-padded taps contribute nothing)."""
    import jax.numpy as jnp

    K = w.shape[0]
    c = (K - 1) // 2
    L = img.shape[axis]
    h = jnp.arange(L, dtype=jnp.int32)
    m = jnp.maximum(ext - 1, 0)
    out = None
    for t in range(K):
        p = h + (t - c)
        p = jnp.where(p < 0, -p, p)  # reflect_101 at 0
        p = jnp.where(p > m, 2 * m - p, p)  # reflect_101 at ext-1
        p = jnp.clip(p, 0, m)  # multi-bounce clamp (kernel wider than image)
        term = w[t] * jnp.take(img, p, axis=axis)
        out = term if out is None else out + term
    return out


@register_operator("GaussianBlur", "gpu")
class GaussianBlurGPU(Operator):
    def _naxes_for(self, layout: str) -> int:
        return 3 if (layout or "").startswith("D") else 1

    def host_params(self, ctx, input_shapes):
        """Per-sample separable kernels, built on the host: sigma/window_size
        may be per-sample tensor args, and the kernel LENGTH is data-dependent
        (2*ceil(3*sigma)+1). Kernels are zero-padded into a grow-latched
        common length so the device program shape stays stable."""
        layout = (ctx.in_layouts(self) or [""])[0]
        naxes = self._naxes_for(layout)
        batches = ctx._arg_batches.get(self.op_id, {})
        n = 1
        for nm in ("sigma", "window_size"):
            if nm in batches:
                n = len(batches[nm].samples)
                break
        rows = []
        for i in range(n):
            params = _blur_params(self.spec, ctx, self, i, naxes=naxes)
            if naxes == 1:
                params = [params]
            rows.append([gaussian_window(w, s)[0] for (s, w) in params])
        K = max(3, max(len(k) for row in rows for k in row))
        if K % 2 == 0:
            K += 1
        self._k_latch = max(getattr(self, "_k_latch", 0), K)
        K = self._k_latch
        wmat = np.zeros((n, naxes, K), np.float32)
        C = (K - 1) // 2
        for i, row in enumerate(rows):
            for a, k in enumerate(row):
                c = (len(k) - 1) // 2
                wmat[i, a, C - c : C - c + len(k)] = k
        return {"gb_w": wmat}

    def device_statics(self, ctx, input_shapes):
        return ("K", getattr(self, "_k_latch", 3))

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        w = jnp.asarray(dctx.param(self, "gb_w"))  # [n|1, naxes, K]
        n = inp.data.shape[0]
        if w.shape[0] == 1 and n != 1:
            w = jnp.broadcast_to(w, (n,) + w.shape[1:])
        layout = inp.layout or ""
        sh = inp.shapes

        def ext_col(i, full):
            if sh is None or sh.shape[1] <= i:
                return jnp.full((n,), full, jnp.int32)
            return sh[:, i].astype(jnp.int32)

        if inp.data.ndim == 5 and layout.startswith("D"):
            D, H, W = inp.data.shape[1:4]
            ed, eh, ew = ext_col(0, D), ext_col(1, H), ext_col(2, W)

            def one(img, wr, d, h, ww):
                img = img.astype(jnp.float32)
                img = _blur_axis_jnp(img, wr[0], d, 0)
                img = _blur_axis_jnp(img, wr[1 % wr.shape[0]], h, 1)
                return _blur_axis_jnp(img, wr[2 % wr.shape[0]], ww, 2)

            out = jax.vmap(one)(inp.data, w, ed, eh, ew)
        elif inp.data.ndim == 5:  # FHWC sequence: per-frame 2-D blur
            H, W = inp.data.shape[2:4]
            eh, ew = ext_col(1, H), ext_col(2, W)

            def one(img, wr, h, ww):
                img = img.astype(jnp.float32)
                img = _blur_axis_jnp(img, wr[0], h, 1)
                return _blur_axis_jnp(img, wr[0], ww, 2)

            out = jax.vmap(one)(inp.data, w, eh, ew)
        else:
            H, W = inp.data.shape[1:3]
            eh, ew = ext_col(0, H), ext_col(1, W)

            def one(img, wr, h, ww):
                img = img.astype(jnp.float32)
                img = _blur_axis_jnp(img, wr[0], h, 0)
                return _blur_axis_jnp(img, wr[0], ww, 1)

            out = jax.vmap(one)(inp.data, w, eh, ew)
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
    def run_batch(self, ctx, *inputs):
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, img):
        size = int(self.spec.GetArgument("window_size", [3])[0])
        if img.ndim == 4 and getattr(self, "_in_layout", "").startswith("F"):
            # FHWC sequence: per-frame 2-D Laplacian, not volumetric across F
            return np.stack([self.run_sample(ctx, idx, fr) for fr in img])
        if img.ndim == 4:  # DHWC volumetric: sum of 3 second derivatives
            scale = _laplacian_scale(self.spec, size, ndim=3)
            deriv, smooth = laplacian_windows(size)
            out = np.zeros(img.shape, np.float32)
            for d_axis in range(3):
                part = img.astype(np.float32)
                for axis in range(3):
                    part = _conv1d_reflect_np(
                        part, deriv if axis == d_axis else smooth, axis)
                out += part
            out *= scale
            dt_arg = self.spec.GetArgument("dtype", None)
            dt = to_numpy_type(dt_arg) if dt_arg is not None else np.dtype(np.float32)
            if np.issubdtype(dt, np.integer):
                info = np.iinfo(dt)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(dt)
        # 2-D: sum of separable second derivatives, own-code conv (reference
        # laplacian_cpu.h over convolution_cpu.h; formerly cv2.Laplacian)
        scale = _laplacian_scale(self.spec, size)
        deriv, smooth = laplacian_windows(size)
        dyy = _sep_conv2d_host(img, deriv, smooth)
        dxx = _sep_conv2d_host(img, smooth, deriv)
        out = (dyy + dxx) * scale
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else np.dtype(np.float32)
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(dt)


@register_operator("Laplacian", "gpu")
class LaplacianGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        size = int(self.spec.GetArgument("window_size", [3])[0])
        deriv, smooth = laplacian_windows(size)
        dv = jnp.asarray(deriv, jnp.float32)
        sm = jnp.asarray(smooth, jnp.float32)
        n = inp.data.shape[0]
        sh = inp.shapes

        def ext(i, full):
            if sh is None or sh.shape[1] <= i:
                return jnp.full((n,), full, jnp.int32)
            return sh[:, i].astype(jnp.int32)

        # reflect-101 bounded by per-sample extents, like GaussianBlur — the
        # canvas-edge conv leaked padding into ragged samples
        if inp.data.ndim == 5 and not (inp.layout or "D").startswith("D"):
            # FHWC sequence: per-frame 2-D Laplacian on axes (1, 2)
            scale = _laplacian_scale(self.spec, size)
            H, W = inp.data.shape[2:4]
            eh, ew = ext(1, H), ext(2, W)

            def one_seq(img, h, w):
                img = img.astype(jnp.float32)
                dyy = _blur_axis_jnp(_blur_axis_jnp(img, dv, h, 1), sm, w, 2)
                dxx = _blur_axis_jnp(_blur_axis_jnp(img, sm, h, 1), dv, w, 2)
                return dyy + dxx

            out = jax.vmap(one_seq)(inp.data, eh, ew) * scale
            dt_arg = self.spec.GetArgument("dtype", None)
            dt = to_jnp_type(dt_arg) if dt_arg is not None else jnp.float32
            return [inp.with_data(_saturate(jnp, out, dt))]
        if inp.data.ndim == 5:  # [N, D, H, W, C] volumetric
            scale = _laplacian_scale(self.spec, size, ndim=3)
            D, H, W = inp.data.shape[1:4]
            exts = [ext(0, D), ext(1, H), ext(2, W)]

            def one(img, d, h, w):
                img = img.astype(jnp.float32)
                acc = None
                for d_axis in range(3):
                    part = img
                    for axis, e in enumerate((d, h, w)):
                        part = _blur_axis_jnp(
                            part, dv if axis == d_axis else sm, e, axis)
                    acc = part if acc is None else acc + part
                return acc

            out = jax.vmap(one)(inp.data, *exts) * scale
        else:
            scale = _laplacian_scale(self.spec, size)
            H, W = inp.data.shape[1:3]
            eh, ew = ext(0, H), ext(1, W)

            # Laplacian = d²/dy² (smoothed in x) + d²/dx² (smoothed in y)
            def one(img, h, w):
                img = img.astype(jnp.float32)
                dyy = _blur_axis_jnp(_blur_axis_jnp(img, dv, h, 0), sm, w, 1)
                dxx = _blur_axis_jnp(_blur_axis_jnp(img, sm, h, 0), dv, w, 1)
                return dyy + dxx

            out = jax.vmap(one)(inp.data, eh, ew) * scale
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
        border = self.spec.GetArgument("border", "reflect_101")
        fill_v = float(np.asarray(fill[0]).reshape(-1)[0]) if fill else \
            float(self.spec.GetArgument("fill_value", 0.0))
        kernel = np.asarray(kernel, np.float32)
        anchor = self.spec.GetArgument("anchor", None)
        ay = ax = -1
        if anchor is not None:
            av = np.asarray(anchor, np.int64).reshape(-1)
            ay, ax = int(av[0]), int(av[-1])
        if self.spec.GetArgument("mode", "same") == "valid":
            # only windows fully inside the input (reference filter.cc mode):
            # anchor (0,0) puts out[y,x] at the window origin, then crop
            oh = img.shape[0] - kernel.shape[0] + 1
            ow = img.shape[1] - kernel.shape[1] + 1
            if oh <= 0 or ow <= 0:
                raise ValueError(
                    f"filter mode='valid': kernel {tuple(kernel.shape)} does "
                    f"not fit inside the input {img.shape[:2]} — no valid "
                    "window exists")
            out = _filter2d_host(img, kernel, border, fill_v, 0, 0)
            out = out[:oh, :ow]
        else:
            out = _filter2d_host(img, kernel, border, fill_v, ay, ax)
        dt_arg = self.spec.GetArgument("dtype", None)
        dt = to_numpy_type(dt_arg) if dt_arg is not None else img.dtype
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(dt)
