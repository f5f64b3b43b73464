"""Geometric warp operators + affine-transform generators.

Reference: ``dali/operators/image/remap/`` (warp_affine.cc, rotate.cc) and
``dali/operators/geometry/affine_transforms/`` (``transforms__*`` schemas:
Rotation, Scale, Shear, Translation, Crop, Combine) plus ``coord_flip.cc`` /
``coord_transform.cc``. Transform generators are host ops producing per-sample
(ndim × ndim+1) matrices; warps consume them on the device.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..kernels import warp as warp_kernel
from ..types import DALIDataType, DALIInterpType, to_jnp_type, to_numpy_type
from .base import Operator

# ===================================== WarpAffine ==============================================

DALI_SCHEMA("WarpAffine").DocStr(
    """Affine warp (reference image/remap/warp_affine.cc). The ``matrix`` maps
    destination to source coordinates (inverse_map=True, the reference
    default): 2x3 (x, y) for images, 3x4 (x, y, z) for DHWC volumes
    (reference warp.h SupportVolumetric)."""
).NumInput(1, 2).NumOutput(1).Devices("cpu", "gpu").AllowSequences().SupportVolumetric().AddOptionalArg(
    "matrix", ArgType.FLOAT_VEC, "Row-major 2x3 (or 3x4 volumetric) transform.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "size", ArgType.FLOAT_VEC, "Output size (H, W); default input size.", None
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "NN or linear.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Border fill value.", 0.0
).AddOptionalArg(
    "inverse_map", ArgType.BOOL, "Matrix maps dst->src (True, default) or src->dst.", True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)


def _invert_affine(m):
    nd = m.shape[0]  # 2 (images) or 3 (volumes)
    a = m[:, :nd]
    t = m[:, nd]
    ai = np.linalg.inv(a)
    return np.concatenate([ai, (-ai @ t)[:, None]], axis=1).astype(np.float32)


class _WarpCommon(Operator):
    @staticmethod
    def _reshape_matrix(m):
        m = np.asarray(m, np.float32)
        if m.size == 6:
            return m.reshape(2, 3)
        if m.size == 12:
            return m.reshape(3, 4)  # volumetric (x, y, z)
        raise ValueError(f"warp matrix must have 6 (2x3) or 12 (3x4) values, got {m.size}")

    def _matrix_for(self, ctx, idx, extra_inputs, vol=False):
        if extra_inputs:
            m = self._reshape_matrix(extra_inputs[0])
        else:
            m = ctx.arg(self, "matrix", idx, None)
            if m is None:
                m = (np.eye(3, 4, dtype=np.float32) if vol
                     else np.array([[1, 0, 0], [0, 1, 0]], np.float32))
            m = self._reshape_matrix(m)
        if not self.spec.GetArgument("inverse_map", True):
            m = _invert_affine(m)
        return m

    def _out_size(self, in_h, in_w):
        size = self.spec.GetArgument("size", None)
        if size:
            return int(round(size[0])), int(round(size[1]))
        return in_h, in_w


@register_operator("WarpAffine", "gpu")
class WarpAffineGPU(_WarpCommon):
    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # extents pass through unless `size` overrides them
        shapes0 = input_shapes[0] if input_shapes else None
        if shapes0 is None:
            return None
        sh = np.asarray(shapes0)
        size = self.spec.GetArgument("size", None)
        if not size:
            return [sh]
        out = sh.copy()
        # `size` replaces the SPATIAL dims: on FHWC sequences those start at
        # column 1 (writing columns (0,1) would clobber (F, H))
        lay = (ctx.in_layouts(self) or [""])[0]
        off = 1 if lay.startswith("F") and sh.shape[1] == len(size) + 2 else 0
        for k, v in enumerate(size):
            out[:, off + k] = int(round(v))
        return [out]

    def host_params(self, ctx, input_shapes):
        if len(input_shapes) > 1:  # actual inputs (eager spec has none)
            return {}  # matrices arrive as a device input
        n = ctx.batch_size
        lay = (ctx.in_layouts(self) or [""])[0]
        vol = (input_shapes[0] is not None and input_shapes[0].shape[1] >= 4
               and not lay.startswith("F"))
        first = self._matrix_for(ctx, 0, [], vol=vol)
        mats = np.zeros((n,) + first.shape, np.float32)
        mats[0] = first
        for i in range(1, n):
            mats[i] = self._matrix_for(ctx, i, [], vol=vol)
        return {"matrices": mats}

    def device_statics(self, ctx, in_shapes):
        # Axis-aligned batches (m01 == m10 == 0: scale + translate) route to
        # the separable MXU lowering — two matmuls per sample instead of VPU
        # gathers (measured ~2x on deep dispatch queues, docs/performance.md;
        # the resampler rewrite proved the same trade). Known only when the
        # matrices are host-side (scalar args, not a tensor input).
        if len(in_shapes) > 1:  # actual inputs (eager spec has none)
            return ("gather",)
        n = ctx.batch_size
        try:
            mats = [self._matrix_for(ctx, i, []) for i in range(n)]
        except ValueError:
            return ("gather",)
        if any(m.shape != (2, 3) for m in mats):
            return ("gather",)  # volumetric path
        sep = all(float(abs(m[0, 1])) == 0.0 and float(abs(m[1, 0])) == 0.0
                  for m in mats)
        return ("separable" if sep else "gather",)

    def lower(self, dctx, inp: DeviceBatch, *matrix_input):
        import jax.numpy as jnp

        if inp.data.ndim == 5 and (inp.layout or "").startswith("F"):
            # FHWC sequence: per-frame 2-D warp, one matrix per sequence
            # (reference sequence broadcasting) — NOT a volumetric warp
            from .image import _SequenceDctx, _fold_frames

            folded, unfold = _fold_frames(inp)
            f = inp.data.shape[1]
            sub = _SequenceDctx(dctx, f)
            mi = ()
            if matrix_input:
                m = matrix_input[0]
                mi = (DeviceBatch(jnp.repeat(m.data, f, axis=0), None, m.layout),)
            return [unfold(self.lower(sub, folded, *mi)[0])]
        if inp.data.ndim == 5:  # [N, D, H, W, C] volumetric
            n, D, H, W, C = inp.data.shape
            size = self.spec.GetArgument("size", None)
            out_d, out_h, out_w = ((int(round(size[0])), int(round(size[1])),
                                    int(round(size[2]))) if size else (D, H, W))
            if matrix_input:
                mats = matrix_input[0].data.astype(jnp.float32).reshape(n, 3, 4)
            else:
                mats = jnp.asarray(dctx.param(self, "matrices"))
            dt_arg = self.spec.GetArgument("dtype", None)
            out_dtype = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
            out = warp_kernel.warp_affine_volumetric_batch(
                inp.data, mats, out_d, out_h, out_w, inp.shapes,
                self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR),
                float(self.spec.GetArgument("fill_value", 0.0)), out_dtype,
            )
            return [DeviceBatch(out, None, inp.layout or "DHWC")]
        n, H, W, C = inp.data.shape
        out_h, out_w = self._out_size(H, W)
        if matrix_input:
            mats = matrix_input[0].data.astype(jnp.float32).reshape(n, 2, 3)
            if not self.spec.GetArgument("inverse_map", True):
                raise NotImplementedError("inverse_map=False with tensor matrices on device")
        else:
            mats = jnp.asarray(dctx.param(self, "matrices"))
        dt_arg = self.spec.GetArgument("dtype", None)
        out_dtype = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
        statics = dctx.static(self)
        kern = (warp_kernel.warp_affine_separable_batch
                if statics and statics[0] == "separable"
                else warp_kernel.warp_affine_batch)
        out = kern(
            inp.data, mats, out_h, out_w, inp.shapes,
            self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR),
            float(self.spec.GetArgument("fill_value", 0.0)), out_dtype,
        )
        return [DeviceBatch(out, None, inp.layout or "HWC")]


@register_operator("WarpAffine", "cpu")
class WarpAffineCPU(_WarpCommon):
    def run_batch(self, ctx, *inputs):
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, img, *matrix_input):
        if img.ndim == 4 and getattr(self, "_in_layout", "").startswith("F"):
            # FHWC sequence: per-frame 2-D warp, one matrix per sequence
            return np.stack([self.run_sample(ctx, idx, fr, *matrix_input)
                             for fr in img])
        if img.ndim == 4:  # DHWC volumetric: own trilinear kernel
            m = self._matrix_for(ctx, idx, matrix_input, vol=True)
            size = self.spec.GetArgument("size", None)
            D, H, W = img.shape[:3]
            od, oh, ow = ((int(round(size[0])), int(round(size[1])),
                           int(round(size[2]))) if size else (D, H, W))
            interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
            fill = float(self.spec.GetArgument("fill_value", 0.0))
            out = warp_kernel.warp_affine_volumetric_np(img, m, od, oh, ow, interp, fill)
            if np.issubdtype(img.dtype, np.integer):
                info = np.iinfo(img.dtype)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(img.dtype)
        import cv2

        m = self._matrix_for(ctx, idx, matrix_input)
        out_h, out_w = self._out_size(img.shape[0], img.shape[1])
        interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        flag = cv2.INTER_NEAREST if interp == DALIInterpType.INTERP_NN else cv2.INTER_LINEAR
        fill = self.spec.GetArgument("fill_value", 0.0)
        out = cv2.warpAffine(
            img, m, (out_w, out_h),
            flags=flag | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(fill, fill, fill, fill),
        )
        return out[:, :, None] if out.ndim == 2 else out


# ======================================= Rotate ===================================================

DALI_SCHEMA("Rotate").DocStr(
    """Rotation with auto-grown canvas (reference image/remap/rotate.cc).
    DHWC volumes rotate about ``axis`` (reference rotate_params.h 3-D
    branch, Rodrigues rotation)."""
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().SupportVolumetric().AddArg(
    "angle", ArgType.FLOAT, "Rotation angle (degrees, counter-clockwise).", per_sample=True, tensor_ok=True
).AddOptionalArg(
    "axis", ArgType.FLOAT_VEC,
    "Rotation axis (x, y, z) for volumetric inputs (reference rotate.cc "
    "`axis`; ignored for 2-D images).", [0.0, 0.0, 1.0], tensor_ok=True, per_sample=True
).AddOptionalArg(
    "keep_size", ArgType.BOOL, "Keep input size instead of growing the canvas.", False
).AddOptionalArg(
    "interp_type", ArgType.INTERP_TYPE, "Interpolation.", DALIInterpType.INTERP_LINEAR
).AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Border fill.", 0.0
).AddOptionalArg("size", ArgType.FLOAT_VEC, "Fixed output size.", None).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
)


@register_operator("Rotate", "gpu")
class RotateGPU(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._grow = [0, 0]

    def _out_size_for(self, h, w, angle):
        size = self.spec.GetArgument("size", None)
        if size:
            return int(size[0]), int(size[1])
        if self.spec.GetArgument("keep_size", False):
            return h, w
        return warp_kernel.rotated_canvas_size(h, w, angle)

    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        n = ctx.batch_size
        lay = (ctx.in_layouts(self) or [""])[0]
        seq = (shapes is not None and shapes.shape[1] >= 4
               and lay.startswith("F"))
        self._seq = seq
        vol = shapes is not None and shapes.shape[1] >= 4 and not seq
        if vol:  # DHWC: rotate about `axis` through the volume center
            mats = np.zeros((n, 3, 4), np.float32)
            size = self.spec.GetArgument("size", None)
            for i in range(n):
                d, h, w = (int(shapes[i][0]), int(shapes[i][1]), int(shapes[i][2]))
                if size and len(size) == 3:
                    od, oh, ow = (int(size[0]), int(size[1]), int(size[2]))
                else:
                    od, oh, ow = d, h, w
                angle = float(np.asarray(ctx.arg(self, "angle", i, 0.0)))
                axis = np.asarray(ctx.arg(self, "axis", i, [0.0, 0.0, 1.0]),
                                  np.float64).reshape(-1)
                mats[i] = warp_kernel.rotation_matrix_3d(
                    angle, axis,
                    ((w - 1) * 0.5, (h - 1) * 0.5, (d - 1) * 0.5),
                    ((ow - 1) * 0.5, (oh - 1) * 0.5, (od - 1) * 0.5))
            self._uniform = True
            self._fixed = None
            return {"matrices": mats}
        if shapes is None:
            raise RuntimeError(
                "Rotate(gpu) needs host-known input shapes (its canvas math "
                "runs on the host); the producing op must implement "
                "host_output_shapes")
        hw0 = 1 if seq else 0  # FHWC shapes: (F, H, W, C)
        mats = np.zeros((n, 2, 3), np.float32)
        sizes = np.zeros((n, 2), np.int32)
        for i in range(n):
            h, w = int(shapes[i][hw0]), int(shapes[i][hw0 + 1])
            angle = float(np.asarray(ctx.arg(self, "angle", i, 0.0)))
            oh, ow = self._out_size_for(h, w, angle)
            sizes[i] = (oh, ow)
            mats[i] = warp_kernel.rotation_matrix(
                angle, ((w - 1) * 0.5, (h - 1) * 0.5), ((ow - 1) * 0.5, (oh - 1) * 0.5)
            )
        align = 32
        self._grow[0] = max(self._grow[0], int(-(-sizes[:, 0].max() // align) * align))
        self._grow[1] = max(self._grow[1], int(-(-sizes[:, 1].max() // align) * align))
        self._uniform = bool((sizes == sizes[0]).all())
        self._fixed = sizes[0] if self._uniform else None
        self._last_sizes = sizes
        ccol = hw0 + 2
        self._last_channels = (shapes[:, ccol].astype(np.int64)
                               if shapes.shape[1] > ccol else None)
        self._last_frames = shapes[:, 0].astype(np.int64) if seq else None
        return {"matrices": mats, "out_sizes": sizes}

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # propagate the canvas math's per-sample output extents (computed in
        # host_params, which the executor runs first) to downstream device ops
        sizes = getattr(self, "_last_sizes", None)
        if sizes is None or self._last_channels is None:
            return None
        cols = [sizes.astype(np.int64), self._last_channels[:, None]]
        if getattr(self, "_last_frames", None) is not None:
            cols = [self._last_frames[:, None]] + cols
        return [np.concatenate(cols, axis=1)]

    def device_statics(self, ctx, input_shapes):
        if self._fixed is None and self._uniform:
            return ("v",)  # volumetric: sizes are trace-time shapes
        if self._uniform:
            return ("u", int(self._fixed[0]), int(self._fixed[1]))
        return ("r", self._grow[0], self._grow[1])

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        if inp.data.ndim == 5 and (inp.layout or "").startswith("F"):
            # FHWC sequence: per-frame 2-D rotate (one angle per sequence)
            from .image import _SequenceDctx, _fold_frames

            folded, unfold = _fold_frames(inp)
            sub = _SequenceDctx(dctx, inp.data.shape[1])
            return [unfold(self.lower(sub, folded)[0])]
        if inp.data.ndim == 5:  # DHWC volumetric
            n, D, H, W, C = inp.data.shape
            size = self.spec.GetArgument("size", None)
            if size and len(size) == 3:
                od, oh, ow = (int(size[0]), int(size[1]), int(size[2]))
            else:
                od, oh, ow = D, H, W  # keep_size semantics on device
            mats = jnp.asarray(dctx.param(self, "matrices"))
            dt_arg = self.spec.GetArgument("dtype", None)
            out_dtype = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
            out = warp_kernel.warp_affine_volumetric_batch(
                inp.data, mats, od, oh, ow, inp.shapes,
                self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR),
                float(self.spec.GetArgument("fill_value", 0.0)), out_dtype,
            )
            return [DeviceBatch(out, None, inp.layout or "DHWC")]
        mats = jnp.asarray(dctx.param(self, "matrices"))
        kind, out_h, out_w = dctx.static(self)
        dt_arg = self.spec.GetArgument("dtype", None)
        out_dtype = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
        out = warp_kernel.warp_affine_batch(
            inp.data, mats, out_h, out_w, inp.shapes,
            self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR),
            float(self.spec.GetArgument("fill_value", 0.0)), out_dtype,
        )
        if kind == "u":
            return [DeviceBatch(out, None, inp.layout or "HWC")]
        sizes = jnp.asarray(dctx.param(self, "out_sizes"))
        out_shapes = jnp.concatenate(
            [sizes, jnp.full((sizes.shape[0], 1), inp.data.shape[3], jnp.int32)], axis=1
        )
        return [DeviceBatch(out, out_shapes, inp.layout or "HWC")]


@register_operator("Rotate", "cpu")
class RotateCPU(Operator):
    def run_batch(self, ctx, *inputs):
        self._in_layout = inputs[0].layout if inputs else ""
        return super().run_batch(ctx, *inputs)

    def run_sample(self, ctx, idx, img):
        angle = float(np.asarray(ctx.arg(self, "angle", idx, 0.0)))
        size = self.spec.GetArgument("size", None)
        if img.ndim == 4 and getattr(self, "_in_layout", "").startswith("F"):
            # FHWC sequence: per-frame 2-D rotate, NOT a volumetric rotation
            return np.stack([self.run_sample(ctx, idx, fr) for fr in img])
        if img.ndim == 4:  # DHWC volumetric: Rodrigues rotation about `axis`
            d, h, w = img.shape[:3]
            if size and len(size) == 3:
                od, oh, ow = int(size[0]), int(size[1]), int(size[2])
            else:
                od, oh, ow = d, h, w
            axis = np.asarray(ctx.arg(self, "axis", idx, [0.0, 0.0, 1.0]),
                              np.float64).reshape(-1)
            m = warp_kernel.rotation_matrix_3d(
                angle, axis, ((w - 1) * 0.5, (h - 1) * 0.5, (d - 1) * 0.5),
                ((ow - 1) * 0.5, (oh - 1) * 0.5, (od - 1) * 0.5))
            interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
            fill = float(self.spec.GetArgument("fill_value", 0.0))
            out = warp_kernel.warp_affine_volumetric_np(img, m, od, oh, ow, interp, fill)
            if np.issubdtype(img.dtype, np.integer):
                info = np.iinfo(img.dtype)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(img.dtype)
        import cv2

        h, w = img.shape[:2]
        if size:
            oh, ow = int(size[0]), int(size[1])
        elif self.spec.GetArgument("keep_size", False):
            oh, ow = h, w
        else:
            oh, ow = warp_kernel.rotated_canvas_size(h, w, angle)
        m = warp_kernel.rotation_matrix(angle, ((w - 1) * 0.5, (h - 1) * 0.5), ((ow - 1) * 0.5, (oh - 1) * 0.5))
        interp = self.spec.GetArgument("interp_type", DALIInterpType.INTERP_LINEAR)
        flag = cv2.INTER_NEAREST if interp == DALIInterpType.INTERP_NN else cv2.INTER_LINEAR
        fill = self.spec.GetArgument("fill_value", 0.0)
        out = cv2.warpAffine(img, m, (ow, oh), flags=flag | cv2.WARP_INVERSE_MAP,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=(fill,) * 4)
        return out[:, :, None] if out.ndim == 2 else out


# =============================== transforms.* (matrix generators) =================================


def _transform_schema(name, doc):
    return (
        DALI_SCHEMA(name)
        .DocStr(doc + " (reference geometry/affine_transforms)")
        .NumInput(0, 1)
        .NumOutput(1)
        .Devices("cpu")
        .AddOptionalArg(
            "reverse_order", ArgType.BOOL,
            "With an input transform T: False (default) applies THIS "
            "transform after T (out = M @ T); True applies it before "
            "(out = T @ M). Reference transform_base.h `reverse_order`.",
            False)
    )


_transform_schema("transforms.Rotation", "Rotation matrix generator.").AddOptionalArg(
    "angle", ArgType.FLOAT, "Angle (degrees).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg("center", ArgType.FLOAT_VEC, "Rotation center (x, y).", None)

_transform_schema("transforms.Scale", "Scaling matrix generator.").AddOptionalArg(
    "scale", ArgType.FLOAT_VEC, "Scale factors.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("center", ArgType.FLOAT_VEC, "Scaling center.", None).AddOptionalArg(
    "ndim", ArgType.INT, "Number of dims when a scalar `scale` should expand.", None)

_transform_schema("transforms.Translation", "Translation matrix generator.").AddOptionalArg(
    "offset", ArgType.FLOAT_VEC, "Translation offset.", None, tensor_ok=True, per_sample=True
)

_transform_schema("transforms.Shear", "Shear matrix generator.").AddOptionalArg(
    "shear", ArgType.FLOAT_VEC, "Shear factors (xy, yx).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "angles", ArgType.FLOAT_VEC, "Shear angles (degrees).", None, tensor_ok=True, per_sample=True
).AddOptionalArg("center", ArgType.FLOAT_VEC, "Shear center.", None)

_transform_schema("transforms.Crop", "Crop-window transform generator.").AddOptionalArg(
    "from_start", ArgType.FLOAT_VEC, "Source window start.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "from_end", ArgType.FLOAT_VEC, "Source window end.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "to_start", ArgType.FLOAT_VEC, "Destination window start.", None
).AddOptionalArg("to_end", ArgType.FLOAT_VEC, "Destination window end.", None).AddOptionalArg(
    "absolute", ArgType.BOOL, "Treat coords as absolute.", False
)

DALI_SCHEMA("transforms.Combine").DocStr(
    "Combines transform matrices (reference transforms.Combine)."
).NumInput(1, 8).NumOutput(1).Devices("cpu").AddOptionalArg(
    "reverse_order", ArgType.BOOL, "Apply inputs right-to-left.", False
)


class _TransformBase(Operator):
    def _compose(self, m_new, m_in):
        """Apply m_new after m_in: both are [2,3] (x, y) affine matrices."""
        if m_in is None:
            return m_new
        a = m_new[:, :2] @ m_in[:, :2]
        t = m_new[:, :2] @ m_in[:, 2] + m_new[:, 2]
        return np.concatenate([a, t[:, None]], axis=1).astype(np.float32)

    def run_sample(self, ctx, idx, *inputs):
        m_in = np.asarray(inputs[0], np.float32) if inputs else None
        m = self._matrix(ctx, idx)
        if self.spec.GetArgument("reverse_order", False) and m_in is not None:
            return self._compose(m_in, m)
        return self._compose(m, m_in)

    def output_layout(self, output_idx, inputs):
        return ""


@register_operator("transforms.Rotation", "cpu")
class TRotation(_TransformBase):
    def _matrix(self, ctx, idx):
        angle = float(np.asarray(ctx.arg(self, "angle", idx, 0.0)))
        center = self.spec.GetArgument("center", None) or [0.0, 0.0]
        a = np.deg2rad(angle)
        c, s = np.cos(a), np.sin(a)
        m = np.array([[c, -s], [s, c]], np.float32)
        t = np.asarray(center, np.float32) - m @ np.asarray(center, np.float32)
        return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)


@register_operator("transforms.Scale", "cpu")
class TScale(_TransformBase):
    def _matrix(self, ctx, idx):
        scale = np.asarray(ctx.arg(self, "scale", idx, [1.0, 1.0]), np.float32).reshape(-1)
        ndim = self.spec.GetArgument("ndim", None)
        if ndim and scale.size == 1:
            scale = np.repeat(scale, int(ndim))
        center = np.asarray(self.spec.GetArgument("center", None) or [0.0, 0.0], np.float32)
        m = np.diag(scale[:2]).astype(np.float32)
        t = center - m @ center
        return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)


@register_operator("transforms.Translation", "cpu")
class TTranslation(_TransformBase):
    def _matrix(self, ctx, idx):
        off = np.asarray(ctx.arg(self, "offset", idx, [0.0, 0.0]), np.float32).reshape(-1)
        return np.array([[1, 0, off[0]], [0, 1, off[1]]], np.float32)


@register_operator("transforms.Shear", "cpu")
class TShear(_TransformBase):
    def _matrix(self, ctx, idx):
        angles = ctx.arg(self, "angles", idx, None)
        if angles is not None:
            a = np.asarray(angles, np.float32).reshape(-1)
            shear = np.tan(np.deg2rad(a))
        else:
            shear = np.asarray(ctx.arg(self, "shear", idx, [0.0, 0.0]), np.float32).reshape(-1)
        center = np.asarray(self.spec.GetArgument("center", None) or [0.0, 0.0], np.float32)
        m = np.array([[1, shear[0]], [shear[1] if shear.size > 1 else 0.0, 1]], np.float32)
        t = center - m @ center
        return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)


@register_operator("transforms.Crop", "cpu")
class TCrop(_TransformBase):
    def _matrix(self, ctx, idx):
        fs = np.asarray(ctx.arg(self, "from_start", idx, [0.0, 0.0]), np.float32).reshape(-1)
        fe = np.asarray(ctx.arg(self, "from_end", idx, [1.0, 1.0]), np.float32).reshape(-1)
        ts = np.asarray(self.spec.GetArgument("to_start", None) or [0.0, 0.0], np.float32)
        te = np.asarray(self.spec.GetArgument("to_end", None) or [1.0, 1.0], np.float32)
        if self.spec.GetArgument("absolute", False):
            # reference transform_crop.cc: swap start/end where start > end
            fs, fe = np.minimum(fs, fe), np.maximum(fs, fe)
            ts, te = np.minimum(ts, te), np.maximum(ts, te)
        scale = (te - ts) / np.where(fe - fs == 0, 1, fe - fs)
        m = np.diag(scale[:2]).astype(np.float32)
        t = ts[:2] - m @ fs[:2]
        return np.concatenate([m, t[:, None]], axis=1).astype(np.float32)


@register_operator("transforms.Combine", "cpu")
class TCombine(_TransformBase):
    def run_sample(self, ctx, idx, *inputs):
        mats = [np.asarray(m, np.float32) for m in inputs]
        if self.spec.GetArgument("reverse_order", False):
            mats = mats[::-1]
        out = None
        for m in mats:
            out = self._compose(m, out)
        return out


# ================================== Coord ops ======================================================

DALI_SCHEMA("CoordFlip").DocStr(
    "Flips coordinates in [0,1] (reference geometry/coord_flip.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "flip_x", ArgType.INT, "Flip x.", 1, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "flip_y", ArgType.INT, "Flip y.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "flip_z", ArgType.INT, "Flip z.", 0, tensor_ok=True, per_sample=True
).AddOptionalArg("layout", ArgType.TENSOR_LAYOUT, "Coordinate layout ('x', 'xy', 'xyz').", "xy").AddOptionalArg(
    "center_x", ArgType.FLOAT, "Flip center x.", 0.5
).AddOptionalArg("center_y", ArgType.FLOAT, "Flip center y.", 0.5).AddOptionalArg(
    "center_z", ArgType.FLOAT, "Flip center z.", 0.5)


@register_operator("CoordFlip", "cpu")
class CoordFlip(Operator):
    def run_sample(self, ctx, idx, coords):
        out = coords.astype(np.float32).copy()
        layout = self.spec.GetArgument("layout", "xy")
        if int(np.asarray(ctx.arg(self, "flip_x", idx, 1))):
            cx = self.spec.GetArgument("center_x", 0.5)
            i = layout.find("x")
            if i >= 0:
                out[..., i] = 2 * cx - out[..., i]
        if int(np.asarray(ctx.arg(self, "flip_y", idx, 0))):
            cy = self.spec.GetArgument("center_y", 0.5)
            i = layout.find("y")
            if i >= 0:
                out[..., i] = 2 * cy - out[..., i]
        if int(np.asarray(ctx.arg(self, "flip_z", idx, 0))):
            cz = self.spec.GetArgument("center_z", 0.5)
            i = layout.find("z")
            if i >= 0:
                out[..., i] = 2 * cz - out[..., i]
        return out


DALI_SCHEMA("CoordTransform").DocStr(
    "Applies an affine transform to point coordinates (reference coord_transform.cc)."
).NumInput(1, 2).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "M", ArgType.FLOAT_VEC, "Row-major matrix.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "T", ArgType.FLOAT_VEC, "Translation.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT)


@register_operator("CoordTransform", "cpu")
class CoordTransform(Operator):
    def run_sample(self, ctx, idx, coords, *mt):
        pts = coords.astype(np.float32)
        d = pts.shape[-1]
        if mt:
            m = np.asarray(mt[0], np.float32)
            if m.shape[-1] == d + 1:
                mat, t = m[:, :d], m[:, d]
            else:
                mat, t = m.reshape(d, d), np.zeros(d, np.float32)
        else:
            M = ctx.arg(self, "M", idx, None)
            mat = np.asarray(M, np.float32).reshape(-1, d) if M is not None else np.eye(d, dtype=np.float32)
            if mat.shape[-1] == d + 1:
                mat, t0 = mat[:, :d], mat[:, d]
            else:
                t0 = np.zeros(mat.shape[0], np.float32)
            T = ctx.arg(self, "T", idx, None)
            t = np.asarray(T, np.float32).reshape(-1) if T is not None else t0
        out = pts @ mat.T + t
        return out.astype(to_numpy_type(self.spec.GetArgument("dtype", DALIDataType.FLOAT)))


@register_operator("CoordTransform", "gpu")
class CoordTransformGPU(Operator):
    """Device lowering (reference coord_transform.cu): points [N, P, D] on
    the padded canvas, out = pts @ M^T + T via one batched einsum (MXU).
    The matrix comes from the M/T keyword arguments (constant or per-sample
    tensor arguments); a positional matrix INPUT is cpu-only."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        sh = input_shapes[0] if input_shapes else None
        if sh is None:
            return None
        sh = np.asarray(sh)
        if "M" in self.spec.arg_inputs:
            # per-sample tensor M may change the coord dim; the device shapes
            # path carries the truth, so don't override it with a host guess
            return None
        M = self.spec.GetArgument("M", None)
        if M is None:
            return [sh]
        d = int(sh[0, -1])
        out_dim = len(np.asarray(M).reshape(-1)) // d
        out = sh.copy()
        out[:, -1] = out_dim
        return [out]

    def lower(self, dctx, coords, *mt):
        import jax.numpy as jnp

        if mt:
            raise ValueError(
                "CoordTransform(gpu): pass the matrix via the M/T keyword "
                "arguments (a positional matrix input is cpu-only)")
        pts = coords.data.astype(jnp.float32)  # [N, ..., D]
        n, d = pts.shape[0], pts.shape[-1]
        mid = pts.shape[1:-1]
        pts = pts.reshape(n, -1, d)  # cpu semantics: transform the last axis
        M = dctx.arg(self, "M", None)
        T = dctx.arg(self, "T", None)
        if M is not None:
            # cpu semantics: row-major with d COLUMNS (out_dim = len // d)
            m = jnp.asarray(M, jnp.float32).reshape(n if dctx.has_tensor_arg(self, "M") else 1, -1)
            out_dim = m.shape[1] // d
            mat = m.reshape(-1, out_dim, d)
        else:
            out_dim = d
            mat = jnp.eye(d, dtype=jnp.float32)[None]
        if T is not None:
            t = jnp.asarray(T, jnp.float32).reshape(
                n if dctx.has_tensor_arg(self, "T") else 1, -1)
        else:
            t = jnp.zeros((1, out_dim), jnp.float32)
        if mat.shape[0] == 1:
            mat = jnp.broadcast_to(mat, (n,) + mat.shape[1:])
        if t.shape[0] == 1:
            t = jnp.broadcast_to(t, (n, t.shape[1]))
        out = jnp.einsum("npd,nkd->npk", pts, mat) + t[:, None, :]
        out = out.reshape((n,) + mid + (out_dim,))
        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        shapes = coords.shapes
        if shapes is not None and out_dim != d:  # dim-raising/lowering M
            shapes = jnp.concatenate(
                [shapes[:, :-1], jnp.full((n, 1), out_dim, shapes.dtype)], axis=1)
        return [coords.with_data(out.astype(to_jnp_type(dt)), shapes=shapes)]
