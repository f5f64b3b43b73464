"""Distortion / displacement / paste operators.

Reference: ``dali/operators/image/remap/`` (displacement: sphere.cc, water.cc,
jitter.cc), ``image/paste/paste.cc``, ``generic/erase/grid_mask.cc``,
``image/distortion/jpeg_compression_distortion_op.cc``,
``image/morphology`` + MedianBlur (cvcuda-backed in the reference). Displacement
warps lower to the same gather machinery as warp_affine.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIInterpType
from .base import Operator


def _bilinear_gather(xp, img, sx, sy, fill_value=0.0, eh=None, ew=None):
    """Sample img [H,W,C] at float coords (sx, sy) [h,w] with border fill.

    ``eh``/``ew`` bound the VALID extent (per-sample logical size on a padded
    canvas) — taps past them take ``fill_value`` instead of reading canvas
    padding."""
    H, W, C = img.shape
    vh = H if eh is None else eh
    vw = W if ew is None else ew
    x0 = xp.floor(sx)
    y0 = xp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    ix0 = x0.astype(xp.int32)
    iy0 = y0.astype(xp.int32)

    def tap(iy, ix):
        valid = (ix >= 0) & (ix < vw) & (iy >= 0) & (iy < vh)
        v = img[xp.clip(iy, 0, H - 1), xp.clip(ix, 0, W - 1)].astype(xp.float32)
        return xp.where(valid[..., None], v, fill_value)

    v = (tap(iy0, ix0) * (1 - wx) + tap(iy0, ix0 + 1) * wx) * (1 - wy) + (
        tap(iy0 + 1, ix0) * (1 - wx) + tap(iy0 + 1, ix0 + 1) * wx
    ) * wy
    return v


def _to_dtype(xp, v, dtype):
    import numpy as _np

    if _np.issubdtype(_np.dtype(str(dtype)), _np.integer):
        info = _np.iinfo(_np.dtype(str(dtype)))
        v = xp.clip(xp.round(v), info.min, info.max)
    return v.astype(dtype)


# ======================================== Water =====================================================

DALI_SCHEMA("Water").DocStr(
    "Sinusoidal water distortion (reference image/remap/water.cc): "
    "src_x = x + ampl_x*sin(freq_x*y + phase_x), likewise for y."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "ampl_x", ArgType.FLOAT, "X amplitude.", 10.0
).AddOptionalArg("ampl_y", ArgType.FLOAT, "Y amplitude.", 10.0).AddOptionalArg(
    "freq_x", ArgType.FLOAT, "X frequency.", 0.049087
).AddOptionalArg("freq_y", ArgType.FLOAT, "Y frequency.", 0.049087).AddOptionalArg(
    "phase_x", ArgType.FLOAT, "X phase.", 0.0
).AddOptionalArg("phase_y", ArgType.FLOAT, "Y phase.", 0.0).AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Border fill.", 0.0
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE,
    "Interpolation (reference displacement_filter.cc default: NN).",
    DALIInterpType.INTERP_NN
).AddOptionalArg(
    "mask", ArgType.INT,
    "Per-sample apply flag: 0 = pass the input through unchanged "
    "(reference displacement_filter.cc `mask`).", 1,
    tensor_ok=True, per_sample=True)


def _water_coords(xp, H, W, spec):
    ax = spec.GetArgument("ampl_x", 10.0)
    ay = spec.GetArgument("ampl_y", 10.0)
    fx = spec.GetArgument("freq_x", 0.049087)
    fy = spec.GetArgument("freq_y", 0.049087)
    px = spec.GetArgument("phase_x", 0.0)
    py = spec.GetArgument("phase_y", 0.0)
    ys = xp.arange(H, dtype=xp.float32)[:, None] * xp.ones((1, W), xp.float32)
    xs = xp.arange(W, dtype=xp.float32)[None, :] * xp.ones((H, 1), xp.float32)
    sx = xs + ax * xp.sin(fx * ys + px)
    sy = ys + ay * xp.cos(fy * xs + py)
    return sx, sy




def _apply_mask(jnp, dctx, op, orig, warped):
    """Per-sample `mask` flag: 0 passes the input through."""
    m = np.asarray(dctx.arg(op, "mask", 1)) if not dctx.has_tensor_arg(op, "mask") \
        else dctx.arg(op, "mask", 1)
    if not dctx.has_tensor_arg(op, "mask"):
        flat = np.asarray(m).reshape(-1)
        if flat.size == 1 and int(flat[0]) == 1:
            return warped
    n = orig.shape[0]
    m = jnp.broadcast_to(jnp.asarray(m).reshape(-1), (n,))
    m = m.reshape((n,) + (1,) * (orig.ndim - 1))
    return jnp.where(m != 0, warped, orig.astype(warped.dtype))



def _maybe_nn(xp, xs, ys, spec):
    """NN interpolation = gather at rounded source coords (reference
    displacement ops default to DALI_INTERP_NN)."""
    if spec.GetArgument("interp_type", DALIInterpType.INTERP_NN) == DALIInterpType.INTERP_NN:
        return xp.round(xs), xp.round(ys)
    return xs, ys

@register_operator("Water", "cpu")
class WaterCPU(Operator):
    def run_sample(self, ctx, idx, img):
        if not int(np.asarray(ctx.arg(self, "mask", idx, 1))):
            return img
        H, W = img.shape[:2]
        sx, sy = _water_coords(np, H, W, self.spec)
        sx, sy = _maybe_nn(np, sx, sy, self.spec)
        out = _bilinear_gather(np, img, sx, sy, self.spec.GetArgument("fill_value", 0.0))
        return _to_dtype(np, out, img.dtype)


@register_operator("Water", "gpu")
class WaterGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        n, H, W = inp.data.shape[:3]
        sx, sy = _water_coords(jnp, H, W, self.spec)
        sx, sy = _maybe_nn(jnp, sx, sy, self.spec)
        fill = self.spec.GetArgument("fill_value", 0.0)
        eh, ew = inp.extent(0), inp.extent(1)  # falls back to the canvas
        out = jax.vmap(lambda im, h, w: _bilinear_gather(
            jnp, im, sx, sy, fill, eh=h, ew=w))(inp.data, eh, ew)
        out = _apply_mask(jnp, dctx, self, inp.data, out)
        return [inp.with_data(_to_dtype(jnp, out, inp.data.dtype))]


# ======================================== Sphere =====================================================

DALI_SCHEMA("Sphere").DocStr(
    "Spherical lens distortion (reference image/remap/sphere.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Border fill.", 0.0
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE,
    "Interpolation (reference displacement_filter.cc default: NN).",
    DALIInterpType.INTERP_NN
).AddOptionalArg(
    "mask", ArgType.INT,
    "Per-sample apply flag: 0 = pass the input through unchanged.", 1,
    tensor_ok=True, per_sample=True)


def _sphere_coords(xp, H, W, eh=None, ew=None):
    # reference displacement: normalized radius warp (sphere.cc); the center
    # and normalization use the per-sample extent when given (padded canvas)
    cy = ((H if eh is None else eh) - 1) * 0.5
    cx = ((W if ew is None else ew) - 1) * 0.5
    ys = (xp.arange(H, dtype=xp.float32)[:, None] - cy) * xp.ones((1, W), xp.float32)
    xs = (xp.arange(W, dtype=xp.float32)[None, :] - cx) * xp.ones((H, 1), xp.float32)
    nx = xs / cx
    ny = ys / cy
    r = xp.sqrt(nx * nx + ny * ny)
    factor = xp.where(r < 1.0, r, 1.0)
    sx = cx + nx * factor * cx
    sy = cy + ny * factor * cy
    return sx, sy


@register_operator("Sphere", "cpu")
class SphereCPU(Operator):
    def run_sample(self, ctx, idx, img):
        if not int(np.asarray(ctx.arg(self, "mask", idx, 1))):
            return img
        H, W = img.shape[:2]
        sx, sy = _sphere_coords(np, H, W)
        sx, sy = _maybe_nn(np, sx, sy, self.spec)
        out = _bilinear_gather(np, img, sx, sy, self.spec.GetArgument("fill_value", 0.0))
        return _to_dtype(np, out, img.dtype)


@register_operator("Sphere", "gpu")
class SphereGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        n, H, W = inp.data.shape[:3]
        fill = self.spec.GetArgument("fill_value", 0.0)
        eh, ew = inp.extent(0), inp.extent(1)  # falls back to the canvas

        def one(im, h, w):
            sx, sy = _sphere_coords(jnp, H, W, eh=h, ew=w)
            sx, sy = _maybe_nn(jnp, sx, sy, self.spec)
            return _bilinear_gather(jnp, im, sx, sy, fill, eh=h, ew=w)

        out = jax.vmap(one)(inp.data, eh, ew)
        out = _apply_mask(jnp, dctx, self, inp.data, out)
        return [inp.with_data(_to_dtype(jnp, out, inp.data.dtype))]


# ======================================== Jitter =====================================================

DALI_SCHEMA("Jitter").DocStr(
    "Random per-pixel displacement within ±nDegree/2 (reference image/remap/jitter.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddRandomSeedArg().AddOptionalArg(
    "nDegree", ArgType.INT, "Jitter extent.", 2
).AddOptionalArg("fill_value", ArgType.FLOAT, "Border fill.", 0.0).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE,
    "Interpolation (reference displacement_filter.cc default: NN).",
    DALIInterpType.INTERP_NN
).AddOptionalArg(
    "mask", ArgType.INT,
    "Per-sample apply flag: 0 = pass the input through unchanged.", 1,
    tensor_ok=True, per_sample=True)


@register_operator("Jitter", "cpu")
class JitterCPU(Operator):
    def run_sample(self, ctx, idx, img):
        rng = ctx.rng(self, idx)
        H, W = img.shape[:2]
        deg = self.spec.GetArgument("nDegree", 2)
        half = deg / 2.0
        dx = rng.uniform(-half, half, (H, W)).astype(np.float32)
        dy = rng.uniform(-half, half, (H, W)).astype(np.float32)
        xs = np.arange(W, dtype=np.float32)[None, :] + dx
        ys = np.arange(H, dtype=np.float32)[:, None] + dy
        if not int(np.asarray(ctx.arg(self, "mask", idx, 1))):
            return img
        xs, ys = _maybe_nn(np, xs, ys, self.spec)
        out = _bilinear_gather(np, img, xs, ys, self.spec.GetArgument("fill_value", 0.0))
        return _to_dtype(np, out, img.dtype)


@register_operator("Jitter", "gpu")
class JitterGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        n, H, W = inp.data.shape[:3]
        deg = self.spec.GetArgument("nDegree", 2)
        half = deg / 2.0
        key = dctx.key(self)
        disp = jax.random.uniform(key, (n, H, W, 2), jnp.float32, -half, half)
        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + disp[..., 0]
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, W)) + disp[..., 1]
        xs, ys = _maybe_nn(jnp, xs, ys, self.spec)
        fill = self.spec.GetArgument("fill_value", 0.0)
        eh, ew = inp.extent(0), inp.extent(1)  # falls back to the canvas
        out = jax.vmap(lambda im, x, y, h, w: _bilinear_gather(
            jnp, im, x, y, fill, eh=h, ew=w))(inp.data, xs, ys, eh, ew)
        out = _apply_mask(jnp, dctx, self, inp.data, out)
        return [inp.with_data(_to_dtype(jnp, out, inp.data.dtype))]


# ======================================== GridMask ===================================================

DALI_SCHEMA("GridMask").DocStr(
    "GridMask erasure (reference generic/erase/grid_mask.cc): zeroes a rotated "
    "grid of squares."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "tile", ArgType.INT, "Grid period (pixels).", 100, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "ratio", ArgType.FLOAT, "Black square size / tile.", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "angle", ArgType.FLOAT, "Grid rotation (radians).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "shift_x", ArgType.FLOAT, "Grid x shift.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg("shift_y", ArgType.FLOAT, "Grid y shift.", 0.0, tensor_ok=True, per_sample=True)


def _gridmask(xp, img, tile, ratio, angle, sx, sy):
    H, W = img.shape[:2]
    ys = xp.arange(H, dtype=xp.float32)[:, None] * xp.ones((1, W), xp.float32)
    xs = xp.arange(W, dtype=xp.float32)[None, :] * xp.ones((H, 1), xp.float32)
    ca, sa = xp.cos(angle), xp.sin(angle)
    rx = (xs - sx) * ca + (ys - sy) * sa
    ry = -(xs - sx) * sa + (ys - sy) * ca
    fx = xp.mod(rx, tile) / tile
    fy = xp.mod(ry, tile) / tile
    keep = (fx >= ratio) | (fy >= ratio)
    return img * keep[..., None].astype(img.dtype)


@register_operator("GridMask", "cpu")
class GridMaskCPU(Operator):
    def run_sample(self, ctx, idx, img):
        # float32 scalars keep the whole computation in float32 — python
        # floats would promote the boundary compare to float64 and flip
        # tile-edge pixels vs the float32 gpu path (reference grid_mask.cu
        # computes in float)
        g = lambda n, d: np.float32(np.asarray(ctx.arg(self, n, idx, d)))
        return _gridmask(np, img, g("tile", 100), g("ratio", 0.5), g("angle", 0.0),
                         g("shift_x", 0.0), g("shift_y", 0.0))


@register_operator("GridMask", "gpu")
class GridMaskGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        n = inp.data.shape[0]

        def arg(nm, d):
            v = dctx.arg(self, nm, d)
            if dctx.has_tensor_arg(self, nm):
                return jnp.asarray(v, jnp.float32).reshape(-1)
            return jnp.full((n,), float(v), jnp.float32)

        tile = arg("tile", 100)
        ratio = arg("ratio", 0.5)
        angle = arg("angle", 0.0)
        sx = arg("shift_x", 0.0)
        sy = arg("shift_y", 0.0)
        out = jax.vmap(lambda im, t, r, a, x, y: _gridmask(jnp, im, t, r, a, x, y))(
            inp.data, tile, ratio, angle, sx, sy
        )
        return [inp.with_data(out)]


# ======================================== Paste ======================================================

DALI_SCHEMA("Paste").DocStr(
    "Pastes the image into a larger filled canvas (reference image/paste/paste.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddArg(
    "ratio", ArgType.FLOAT, "Canvas enlargement ratio (>= 1).", tensor_ok=True, per_sample=True
).AddOptionalArg(
    "paste_x", ArgType.FLOAT, "Horizontal position [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "paste_y", ArgType.FLOAT, "Vertical position [0,1].", 0.5, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "fill_value", ArgType.FLOAT_VEC, "Canvas fill (per channel).", [0.0]
).AddOptionalArg(
    "min_canvas_size", ArgType.FLOAT, "Minimum canvas extent.", 0.0
).AddOptionalArg(
    "n_channels", ArgType.INT,
    "Number of output channels (reference paste.cc `n_channels`); the "
    "fill_value list must match. Defaults to the input's channel count.",
    None)


@register_operator("Paste", "cpu")
class PasteCPU(Operator):
    def run_sample(self, ctx, idx, img):
        r = float(np.asarray(ctx.arg(self, "ratio", idx, 1.0)))
        px = float(np.asarray(ctx.arg(self, "paste_x", idx, 0.5)))
        py = float(np.asarray(ctx.arg(self, "paste_y", idx, 0.5)))
        h, w, c = img.shape
        ch = max(int(round(h * r)), int(self.spec.GetArgument("min_canvas_size", 0.0)), h)
        cw = max(int(round(w * r)), int(self.spec.GetArgument("min_canvas_size", 0.0)), w)
        fill = self.spec.GetArgument("fill_value", [0.0])
        nc = int(self.spec.GetArgument("n_channels", None) or c)
        if nc < c:
            raise ValueError(f"Paste n_channels={nc} < input channels {c}")
        canvas = np.empty((ch, cw, nc), img.dtype)
        canvas[...] = np.asarray(fill, img.dtype).reshape(1, 1, -1)
        y = int(round(py * (ch - h)))
        x = int(round(px * (cw - w)))
        canvas[y : y + h, x : x + w, :c] = img
        return canvas


# ============================= JPEG compression distortion ============================================

DALI_SCHEMA("JpegCompressionDistortion").DocStr(
    "Simulates JPEG compression artifacts (reference "
    "image/distortion/jpeg_compression_distortion_op.cc): encode at `quality`, decode back."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "quality", ArgType.FLOAT, "JPEG quality (1..100).", 50.0, tensor_ok=True, per_sample=True
)


@register_operator("JpegCompressionDistortion", "cpu")
class JpegDistortion(Operator):
    def run_sample(self, ctx, idx, img):
        import cv2

        q = int(np.asarray(ctx.arg(self, "quality", idx, 50.0)))
        ok, buf = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
        out = cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]
        return np.ascontiguousarray(out)


# ======================================== MedianBlur ==================================================

DALI_SCHEMA("experimental.MedianBlur").DocStr(
    "Median filter (reference image/morphology MedianBlur via CV-CUDA)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "window_size", ArgType.INT_VEC, "Kernel size (odd).", [3]
)


@register_operator("experimental.MedianBlur", "cpu")
class MedianBlur(Operator):
    def run_sample(self, ctx, idx, img):
        from .. import native

        k = int(self.spec.GetArgument("window_size", [3])[0])
        if native.available() and native.has_host_imgproc() and img.dtype == np.uint8:
            # own-code kernel (host_ops.cc Huang sliding histogram; verified
            # bit-identical to cv2.medianBlur for uint8 in test_host_imgproc)
            return native.median_blur_u8(img, k)
        import cv2

        out = cv2.medianBlur(img, k)
        return out[:, :, None] if out.ndim == 2 and img.ndim == 3 else out


# ======================================== Morphology ==================================================

for _nm, _doc in (("experimental.Dilate", "Dilation"), ("experimental.Erode", "Erosion")):
    DALI_SCHEMA(_nm).DocStr(
        f"{_doc} (reference image/morphology/morphology.cc via CV-CUDA)."
    ).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
        "mask_size", ArgType.INT_VEC, "Structuring element size.", [3, 3]
    ).AddOptionalArg(
        "anchor", ArgType.INT_VEC, "Anchor (-1 = center).", [-1, -1]
    ).AddOptionalArg(
        "iterations", ArgType.INT,
        "Number of times the operation is applied (reference "
        "morphology.cc `iterations`).", 1
    ).AddOptionalArg(
        "border_mode", ArgType.STRING,
        '"constant" (outside pixels take the reduction identity — matching '
        'CV-CUDA\'s default) or "replicate".', "constant")


class _MorphBase(Operator):
    op_name = "dilate"

    def run_sample(self, ctx, idx, img):
        from .. import native

        ms = self.spec.GetArgument("mask_size", [3, 3])
        anchor = self.spec.GetArgument("anchor", [-1, -1])
        iters = int(self.spec.GetArgument("iterations", 1))
        replicate = self.spec.GetArgument("border_mode", "constant") == "replicate"
        if native.available() and native.has_host_imgproc() and img.dtype == np.uint8:
            # own-code separable min/max (host_ops.cc; verified bit-identical
            # to cv2.erode/dilate for full-ones kernels in test_host_imgproc)
            return native.morph_u8(img, int(ms[0]), int(ms[-1]),
                                   int(anchor[0]), int(anchor[-1]), iters,
                                   self.op_name == "dilate", replicate)
        import cv2

        kernel = np.ones((int(ms[0]), int(ms[-1])), np.uint8)
        fn = cv2.dilate if self.op_name == "dilate" else cv2.erode
        border = cv2.BORDER_REPLICATE if replicate else cv2.BORDER_CONSTANT
        out = fn(img, kernel, iterations=iters, borderType=border)
        return out[:, :, None] if out.ndim == 2 and img.ndim == 3 else out


register_operator("experimental.Dilate", "cpu")(type("DilateCPU", (_MorphBase,), {"op_name": "dilate"}))
register_operator("experimental.Erode", "cpu")(type("ErodeCPU", (_MorphBase,), {"op_name": "erode"}))
