"""Color manipulation operators.

Reference: ``dali/operators/image/color/`` (brightness_contrast.cc, hsv.cc,
color_twist.h, color_space_conversion.cc). Each op has a host (numpy) and a
device (jnp) implementation sharing the formulas in
:mod:`dali_tpu.kernels.pointwise`; per-sample arguments (e.g. hue from
``fn.random.uniform``) flow to the device as stacked argument-input arrays.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..kernels import pointwise as pw
from ..types import DALIDataType, DALIImageType, to_jnp_type, to_numpy_type
from .base import Operator


def _float_arg_batchwise(dctx, op, name, default, n):
    import jax.numpy as jnp

    v = dctx.arg(op, name, default)
    if dctx.has_tensor_arg(op, name):
        return jnp.asarray(v, jnp.float32).reshape(-1)
    return jnp.full((n,), float(v), jnp.float32)


def _out_dtype(spec, in_dtype, np_side=True):
    dt = spec.GetArgument("dtype", None)
    if dt is None:
        return in_dtype
    return to_numpy_type(dt) if np_side else to_jnp_type(dt)


# ================================ BrightnessContrast ==========================================

for _name in ("BrightnessContrast", "Brightness", "Contrast"):
    DALI_SCHEMA(_name).DocStr(
        f"{_name} adjustment (reference image/color/brightness_contrast.cc): "
        "out = brightness_shift*range + brightness*(center + contrast*(in - center))."
    ).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
        "brightness", ArgType.FLOAT, "Multiplicative brightness.", 1.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "brightness_shift", ArgType.FLOAT, "Additive brightness (fraction of range).", 0.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "contrast", ArgType.FLOAT, "Contrast factor.", 1.0, tensor_ok=True, per_sample=True
    ).AddOptionalArg(
        "contrast_center", ArgType.FLOAT, "Contrast pivot (default: half range).", None, tensor_ok=True, per_sample=True
    ).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)


class _BCBase(Operator):
    def _params(self, get, in_dtype):
        r_in = pw.dtype_range(in_dtype)
        center = get("contrast_center", None)
        if center is None:
            center = 0.5 * r_in
        return (
            get("brightness", 1.0),
            get("brightness_shift", 0.0),
            get("contrast", 1.0),
            center,
        )


def _register_bc(name):
    @register_operator(name, "cpu")
    class BCcpu(_BCBase):
        def run_sample(self, ctx, idx, img):
            def get(nm, d):
                v = ctx.arg(self, nm, idx, d)
                return d if v is None else float(np.asarray(v).reshape(-1)[0])

            b = get("brightness", 1.0)
            bs = get("brightness_shift", 0.0)
            c = get("contrast", 1.0)
            cc = ctx.arg(self, "contrast_center", idx, None)
            cc = 0.5 * pw.dtype_range(img.dtype) if cc is None else float(np.asarray(cc))
            out_dt = _out_dtype(self.spec, img.dtype)
            return pw.brightness_contrast(np, img, b, bs, c, cc, out_dt)

    @register_operator(name, "gpu")
    class BCgpu(_BCBase):
        def lower(self, dctx, inp: DeviceBatch):
            import jax.numpy as jnp

            n = inp.data.shape[0]
            b = _float_arg_batchwise(dctx, self, "brightness", 1.0, n)
            bs = _float_arg_batchwise(dctx, self, "brightness_shift", 0.0, n)
            c = _float_arg_batchwise(dctx, self, "contrast", 1.0, n)
            r_in = pw.dtype_range(np.dtype(str(inp.data.dtype)))
            cc_default = 0.5 * r_in
            if dctx.has_tensor_arg(self, "contrast_center"):
                cc = jnp.asarray(dctx.arg(self, "contrast_center"), jnp.float32).reshape(-1)
            else:
                v = self.spec.GetArgument("contrast_center", None)
                cc = jnp.full((n,), cc_default if v is None else float(v), jnp.float32)
            extra = (1,) * (inp.data.ndim - 1)
            b, bs, c, cc = (v.reshape(n, *extra) for v in (b, bs, c, cc))
            out_dt = _out_dtype(self.spec, inp.data.dtype, np_side=False)
            out = pw.brightness_contrast(jnp, inp.data, b, bs, c, cc, out_dt)
            return [inp.with_data(out)]

    BCcpu.__name__ = name + "CPU"
    BCgpu.__name__ = name + "GPU"


for _name in ("BrightnessContrast", "Brightness", "Contrast"):
    _register_bc(_name)


# ====================================== Hsv / Hue / Saturation =================================

DALI_SCHEMA("Hsv").DocStr(
    "Hue/saturation/value adjustment via linear YIQ matrices (reference image/color/hsv.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "hue", ArgType.FLOAT, "Hue rotation in degrees.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "saturation", ArgType.FLOAT, "Saturation multiplier.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "value", ArgType.FLOAT, "Value multiplier.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)

DALI_SCHEMA("Hue").DocStr("Hue rotation (reference hue.cc).").NumInput(1).NumOutput(1).Devices(
    "cpu", "gpu"
).AllowSequences().AddOptionalArg(
    "hue", ArgType.FLOAT, "Hue rotation in degrees.", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE,
    "Input/output color space (deprecated in the reference "
    "ColorTransformBase; accepted for compatibility, RGB assumed).",
    DALIImageType.RGB)

DALI_SCHEMA("Saturation").DocStr("Saturation scaling (reference saturation.cc).").NumInput(1).NumOutput(
    1
).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "saturation", ArgType.FLOAT, "Saturation multiplier.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE,
    "Input/output color space (deprecated in the reference "
    "ColorTransformBase; accepted for compatibility, RGB assumed).",
    DALIImageType.RGB)


class _HsvLikeCPU(Operator):
    def run_sample(self, ctx, idx, img):
        h = float(np.asarray(ctx.arg(self, "hue", idx, 0.0))) if "hue" in self.spec.schema.args else 0.0
        s = (
            float(np.asarray(ctx.arg(self, "saturation", idx, 1.0)))
            if "saturation" in self.spec.schema.args
            else 1.0
        )
        v = float(np.asarray(ctx.arg(self, "value", idx, 1.0))) if "value" in self.spec.schema.args else 1.0
        return pw.hsv_adjust(np, img, h, s, v, _out_dtype(self.spec, img.dtype))


class _HsvLikeGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        n = inp.data.shape[0]
        args = self.spec.schema.args
        h = _float_arg_batchwise(dctx, self, "hue", 0.0, n) if "hue" in args else jnp.zeros((n,))
        s = (
            _float_arg_batchwise(dctx, self, "saturation", 1.0, n)
            if "saturation" in args
            else jnp.ones((n,))
        )
        v = _float_arg_batchwise(dctx, self, "value", 1.0, n) if "value" in args else jnp.ones((n,))
        mats = pw.color_twist_matrices_batch(jnp, h, s, v)
        out = pw.apply_color_matrices_batch(jnp, inp.data.astype(jnp.float32), mats)
        out = pw.saturate_cast(jnp, out, _out_dtype(self.spec, inp.data.dtype, np_side=False))
        return [inp.with_data(out)]


for _name in ("Hsv", "Hue", "Saturation"):
    register_operator(_name, "cpu")(type(_name + "CPU", (_HsvLikeCPU,), {}))
    register_operator(_name, "gpu")(type(_name + "GPU", (_HsvLikeGPU,), {}))


# ====================================== ColorTwist ==============================================

DALI_SCHEMA("ColorTwist").DocStr(
    "Combined hue/saturation/brightness/contrast (reference color_twist.h)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "hue", ArgType.FLOAT, "Hue rotation (degrees).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "saturation", ArgType.FLOAT, "Saturation multiplier.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "brightness", ArgType.FLOAT, "Brightness multiplier.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "contrast", ArgType.FLOAT, "Contrast factor.", 1.0, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None).AddOptionalArg(
    "image_type", ArgType.IMAGE_TYPE,
    "Input/output color space (deprecated in the reference "
    "ColorTransformBase; accepted for compatibility, RGB assumed).",
    DALIImageType.RGB)


@register_operator("ColorTwist", "cpu")
class ColorTwistCPU(Operator):
    def run_sample(self, ctx, idx, img):
        g = lambda n, d: float(np.asarray(ctx.arg(self, n, idx, d)))
        return pw.color_twist(
            np, img, g("hue", 0.0), g("saturation", 1.0), g("brightness", 1.0), g("contrast", 1.0),
            _out_dtype(self.spec, img.dtype),
        )


@register_operator("ColorTwist", "gpu")
class ColorTwistGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        n = inp.data.shape[0]
        h = _float_arg_batchwise(dctx, self, "hue", 0.0, n)
        s = _float_arg_batchwise(dctx, self, "saturation", 1.0, n)
        b = _float_arg_batchwise(dctx, self, "brightness", 1.0, n)
        c = _float_arg_batchwise(dctx, self, "contrast", 1.0, n)
        out_dt = _out_dtype(self.spec, inp.data.dtype, np_side=False)
        r = pw.dtype_range(np.dtype(str(inp.data.dtype)))
        mats = pw.color_twist_matrices_batch(jnp, h, s, jnp.ones((n,)))
        out = pw.apply_color_matrices_batch(jnp, inp.data.astype(jnp.float32), mats)
        center = 0.5 * r
        extra = (1,) * (inp.data.ndim - 1)
        out = b.reshape(n, *extra) * (center + c.reshape(n, *extra) * (out - center))
        return [inp.with_data(pw.saturate_cast(jnp, out, out_dt))]


# ================================== ColorSpaceConversion ========================================

_CS_NAMES = {
    int(DALIImageType.RGB): "RGB",
    int(DALIImageType.BGR): "BGR",
    int(DALIImageType.GRAY): "GRAY",
    int(DALIImageType.YCbCr): "YCbCr",
}

DALI_SCHEMA("ColorSpaceConversion").DocStr(
    "Converts between RGB/BGR/YCbCr/GRAY (reference color_space_conversion.cc; "
    "BT.601 constants from color_space_conversion_impl.h)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddArg(
    "image_type", ArgType.IMAGE_TYPE, "Input color space."
).AddArg("output_type", ArgType.IMAGE_TYPE, "Output color space.")


@register_operator("ColorSpaceConversion", "cpu")
class CSCcpu(Operator):
    def run_sample(self, ctx, idx, img):
        src = _CS_NAMES[int(self.spec.GetArgument("image_type"))]
        dst = _CS_NAMES[int(self.spec.GetArgument("output_type"))]
        return pw.convert_color_space(np, img, src, dst, img.dtype)


@register_operator("ColorSpaceConversion", "gpu")
class CSCgpu(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        src = _CS_NAMES[int(self.spec.GetArgument("image_type"))]
        dst = _CS_NAMES[int(self.spec.GetArgument("output_type"))]
        out = pw.convert_color_space(jnp, inp.data, src, dst, inp.data.dtype)
        shapes = inp.shapes
        if shapes is not None and out.shape[-1] != inp.data.shape[-1]:
            shapes = shapes.at[:, -1].set(out.shape[-1]) if hasattr(shapes, "at") else shapes
        return [DeviceBatch(out, shapes, inp.layout)]
