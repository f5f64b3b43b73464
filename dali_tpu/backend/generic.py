"""Generic tensor operators (reference ``dali/operators/generic/``)."""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIDataType, to_jnp_type, to_numpy_type
from .base import Operator

# ===================================== Cast ====================================================

DALI_SCHEMA("Cast").DocStr("Casts to another dtype (reference generic/cast.cc).").NumInput(1).NumOutput(
    1
).Devices("cpu", "gpu").AllowSequences().AddArg("dtype", ArgType.DATA_TYPE, "Target dtype.")

DALI_SCHEMA("CastLike").DocStr("Casts input 0 to the dtype of input 1.").NumInput(2).NumOutput(1).Devices(
    "cpu", "gpu"
).AllowSequences()


@register_operator("Cast", "cpu")
class CastCPU(Operator):
    def run_sample(self, ctx, idx, x):
        return x.astype(to_numpy_type(self.spec.GetArgument("dtype")))


@register_operator("Cast", "gpu")
class CastGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        return [inp.with_data(inp.data.astype(to_jnp_type(self.spec.GetArgument("dtype"))))]


@register_operator("CastLike", "cpu")
class CastLikeCPU(Operator):
    def run_sample(self, ctx, idx, x, like):
        return x.astype(like.dtype)


@register_operator("CastLike", "gpu")
class CastLikeGPU(Operator):
    def lower(self, dctx, a: DeviceBatch, b: DeviceBatch):
        return [a.with_data(a.data.astype(b.data.dtype))]


# ==================================== Shapes =====================================================

DALI_SCHEMA("Shapes").DocStr(
    "Per-sample shapes (reference generic/shapes.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AllowSequences().AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.INT64
)


@register_operator("Shapes", "cpu")
class ShapesCPU(Operator):
    def run_sample(self, ctx, idx, x):
        return np.array(x.shape, dtype=to_numpy_type(self.spec.GetArgument("dtype", DALIDataType.INT64)))

    def output_layout(self, output_idx, inputs):
        return ""


@register_operator("Shapes", "gpu")
class ShapesGPU(Operator):
    def host_output_layouts(self, in_layouts):
        return [""]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        dt = to_jnp_type(self.spec.GetArgument("dtype", DALIDataType.INT64))
        if inp.shapes is not None:
            return [DeviceBatch(inp.shapes.astype(dt), None, "")]
        n = inp.data.shape[0]
        shp = jnp.tile(jnp.asarray(inp.data.shape[1:], dt)[None], (n, 1))
        return [DeviceBatch(shp, None, "")]


# ==================================== Reshape & friends ===========================================

DALI_SCHEMA("Reshape").DocStr(
    "Reinterprets shape without touching data (reference generic/reshape.cc)."
).NumInput(1, 2).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "shape", ArgType.FLOAT_VEC, "New sample shape (-1 infers one dim).", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "layout", ArgType.TENSOR_LAYOUT, "New layout.", None
).AddOptionalArg(
    "rel_shape", ArgType.FLOAT_VEC, "Shape relative to input.", None
).AddOptionalArg(
    "src_dims", ArgType.INT_VEC, "Dimension permutation/selection.", None
)


def _resolve_shape(cur_shape, req):
    req = [int(round(v)) for v in req]
    total = int(np.prod(cur_shape))
    if -1 in req:
        known = int(np.prod([v for v in req if v != -1]))
        req[req.index(-1)] = total // max(known, 1)
    return req


@register_operator("Reshape", "cpu")
class ReshapeCPU(Operator):
    def run_sample(self, ctx, idx, x, *shape_in):
        if shape_in:
            shape = [int(v) for v in np.asarray(shape_in[0]).reshape(-1)]
        else:
            # ctx.arg resolves per-sample TENSOR shapes too (reference
            # reshape.cc accepts `shape` as an argument input)
            shape = ctx.arg(self, "shape", idx, None)
            if shape is not None:
                shape = [float(v) for v in np.asarray(shape).reshape(-1)]
            if shape is None:
                rel = self.spec.GetArgument("rel_shape", None)
                if rel is None:
                    return x  # layout-only change
                shape = [x.shape[i] * rel[i] for i in range(len(rel))]
        return x.reshape(_resolve_shape(x.shape, shape))

    def output_layout(self, output_idx, inputs):
        layout = self.spec.GetArgument("layout", None)
        return layout if layout is not None else ""


@register_operator("Reshape", "gpu")
class ReshapeGPU(Operator):
    def host_output_layouts(self, in_layouts):
        layout = self.spec.GetArgument("layout", None)
        if layout is not None:
            return [layout]
        if (self.spec.GetArgument("shape", None) is None
                and "shape" not in self.spec.arg_inputs
                and len(in_layouts) < 2):  # actual inputs (eager spec has none)
            return [in_layouts[0] if in_layouts else ""]
        return [""]

    def _per_sample_shapes(self, ctx, input_shapes):
        """Per-sample target shapes when `shape` is a tensor ARGUMENT (host
        data); None for the static paths. A positional shape INPUT is
        cpu-only (its batch is not visible at host-params time)."""
        if "shape" not in self.spec.arg_inputs:
            return None
        b = ctx._arg_batches.get(self.op_id, {}).get("shape")
        if b is None:
            return None
        vals = [np.asarray(s).reshape(-1) for s in b.samples]
        ish = input_shapes[0] if input_shapes else None
        out = []
        for i, v in enumerate(vals):
            if ish is not None:
                cur = [int(x) for x in np.asarray(ish)[i]]
            else:
                cur = None  # uniform canvas: resolved against it in lower
            if cur is None and -1 in [int(round(x)) for x in v]:
                raise ValueError(
                    "Reshape(gpu): -1 in a per-sample shape needs host-known "
                    "input shapes")
            out.append(_resolve_shape(cur or [0], [float(x) for x in v])
                       if cur is not None else [int(round(x)) for x in v])
        k = max(len(s) for s in out)
        if any(len(s) != k for s in out):
            raise ValueError("Reshape(gpu): per-sample shapes must share a rank")
        return np.asarray(out, np.int64)

    def host_params(self, ctx, input_shapes, input_batches=None):
        ps = self._per_sample_shapes(ctx, input_shapes)
        self._ps = ps
        if ps is None:
            return {}
        latch = getattr(self, "_canvas_latch", None)
        mx = ps.max(axis=0)
        self._canvas_latch = (mx if latch is None
                              else np.maximum(np.asarray(latch), mx))
        return {"reshape_shapes": ps.astype(np.int32)}

    def device_statics(self, ctx, input_shapes, input_batches=None):
        if getattr(self, "_ps", None) is None:
            return None
        return ("ps",) + tuple(int(v) for v in self._canvas_latch)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        ps = getattr(self, "_ps", None)
        if ps is None:
            return None
        return [ps]

    def _lower_per_sample(self, dctx, inp, oc):
        """Per-sample target shapes on a padded canvas: each output element's
        row-major index within ITS sample maps back through the sample's
        input extents onto the input canvas — one gather per sample."""
        import jax
        import jax.numpy as jnp

        n = inp.data.shape[0]
        ic = inp.data.shape[1:]  # input canvas dims
        out_ext = jnp.asarray(dctx.param(self, "reshape_shapes"))  # [n, k]
        if inp.shapes is not None:
            in_ext = inp.shapes[:, :len(ic)].astype(jnp.int32)
        else:
            in_ext = jnp.tile(jnp.asarray([list(ic)], jnp.int32), (n, 1))
        M = int(np.prod(oc))
        coords = np.stack(np.unravel_index(np.arange(M), oc)).astype(np.int32)
        ic_strides = np.array(
            [int(np.prod(ic[d + 1:])) for d in range(len(ic))], np.int32)

        def one(flat_in, ie, oe):
            # j: row-major index within the sample's LOGICAL out shape
            st = jnp.concatenate(
                [jnp.cumprod(oe[::-1])[::-1][1:], jnp.ones((1,), oe.dtype)])
            j = jnp.zeros((M,), jnp.int32)
            for d in range(len(oc)):
                j = j + coords[d] * st[d].astype(jnp.int32)
            # unravel j over the sample's INPUT extents, onto canvas strides
            rem = j
            idx = jnp.zeros((M,), jnp.int32)
            for d in range(len(ic)):
                p = (jnp.prod(ie[d + 1:].astype(jnp.int32))
                     if d + 1 < len(ic) else jnp.int32(1))
                q = rem // p
                rem = rem - q * p
                idx = idx + jnp.clip(q, 0, ie[d] - 1).astype(jnp.int32) * ic_strides[d]
            return jnp.take(flat_in, idx).reshape(oc)

        flat = inp.data.reshape(n, -1)
        out = jax.vmap(one)(flat, in_ext, out_ext)
        layout = self.spec.GetArgument("layout", None)
        return [DeviceBatch(out, out_ext, layout or "")]

    def lower(self, dctx, inp: DeviceBatch, *shape_in):
        st = dctx.static(self)
        if isinstance(st, tuple) and st and st[0] == "ps":
            return self._lower_per_sample(dctx, inp, tuple(st[1:]))
        if shape_in:
            raise NotImplementedError(
                "Reshape(gpu): pass per-sample target shapes via the "
                "`shape` tensor ARGUMENT (a positional shape input is "
                "cpu-only)")
        if inp.shapes is not None:
            raise NotImplementedError(
                "Reshape(gpu) on ragged batches needs per-sample target "
                "shapes (pass `shape` as a tensor argument)")
        shape = self.spec.GetArgument("shape", None)
        layout = self.spec.GetArgument("layout", None)
        if shape is None:
            return [DeviceBatch(inp.data, None, layout if layout is not None else inp.layout)]
        n = inp.data.shape[0]
        new_shape = _resolve_shape(inp.data.shape[1:], shape)
        return [DeviceBatch(inp.data.reshape(n, *new_shape), None, layout or "")]


DALI_SCHEMA("ExpandDims").DocStr("Insert size-1 dims.").NumInput(1).NumOutput(1).Devices(
    "cpu", "gpu"
).AddArg("axes", ArgType.INT_VEC, "Positions of new dims.").AddOptionalArg(
    "new_axis_names", ArgType.TENSOR_LAYOUT, "Layout names for new dims.", None
)


def _expand_layout(layout, axes, names):
    """Insert new_axis_names into the layout at the expanded positions.
    The reference sorts (axis, name) PAIRS together (expand_dims.cc:110-112),
    so names follow their axes under reordering; a non-empty names string of
    the wrong length is an error there too."""
    if not layout:
        return ""
    names = names or ""
    if names and len(names) != len(axes):
        raise ValueError(
            "ExpandDims: new_axis_names must have one name per entry of "
            f"`axes` (got {len(names)} names for {len(axes)} axes)")
    pairs = sorted(zip(axes, names or "?" * len(axes)))
    out = list(layout)
    for ax, ch in pairs:
        out.insert(ax, ch)
    return "".join(out) if "?" not in out else ""


@register_operator("ExpandDims", "cpu")
class ExpandDimsCPU(Operator):
    def run_sample(self, ctx, idx, x):
        for ax in sorted(self.spec.GetArgument("axes")):
            x = np.expand_dims(x, ax)
        return x

    def output_layout(self, j, inputs):
        return _expand_layout(inputs[0].layout if inputs else "",
                              self.spec.GetArgument("axes"),
                              self.spec.GetArgument("new_axis_names", None))


@register_operator("ExpandDims", "gpu")
class ExpandDimsGPU(Operator):
    def host_output_layouts(self, in_layouts):
        return [_expand_layout(in_layouts[0] if in_layouts else "",
                               self.spec.GetArgument("axes"),
                               self.spec.GetArgument("new_axis_names", None))]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        x = inp.data
        shapes = inp.shapes
        for ax in sorted(self.spec.GetArgument("axes")):
            x = jnp.expand_dims(x, ax + 1)  # +1 for batch dim
            if shapes is not None:  # ragged extents gain a 1-column
                shapes = jnp.concatenate(
                    [shapes[:, :ax],
                     jnp.ones((shapes.shape[0], 1), shapes.dtype),
                     shapes[:, ax:]], axis=1)
        layout = _expand_layout(inp.layout, self.spec.GetArgument("axes"),
                                self.spec.GetArgument("new_axis_names", None))
        return [DeviceBatch(x, shapes, layout)]


DALI_SCHEMA("Squeeze").DocStr("Remove size-1 dims.").NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "axes", ArgType.INT_VEC, "Dims to remove.", None
).AddOptionalArg("axis_names", ArgType.TENSOR_LAYOUT, "Layout names of dims to remove.", None)


def _squeeze_axes(spec, layout, ndim):
    names = spec.GetArgument("axis_names", None)
    if names:
        if not layout:
            raise ValueError("Squeeze: axis_names requires a layout on the input")
        return [layout.index(ch) for ch in names]
    axes = spec.GetArgument("axes", None)
    return [a % ndim for a in axes] if axes else None


@register_operator("Squeeze", "cpu")
class SqueezeCPU(Operator):
    def run_batch(self, ctx, inp):
        self._in_layout = inp.layout or ""
        return super().run_batch(ctx, inp)

    def run_sample(self, ctx, idx, x):
        axes = _squeeze_axes(self.spec, getattr(self, "_in_layout", ""), x.ndim)
        return np.squeeze(x, axis=tuple(axes) if axes else None)

    def output_layout(self, j, inputs):
        layout = inputs[0].layout if inputs else ""
        if not layout:
            return ""
        axes = _squeeze_axes(self.spec, layout, len(layout))
        if axes is None:
            return ""  # squeeze-all: removed dims depend on per-sample shape
        return "".join(ch for i, ch in enumerate(layout) if i not in set(axes))


@register_operator("Squeeze", "gpu")
class SqueezeGPU(Operator):
    def host_output_layouts(self, in_layouts):
        layout = in_layouts[0] if in_layouts else ""
        if not layout:
            return [""]
        axes = _squeeze_axes(self.spec, layout, len(layout))
        if axes is None:
            return [""]  # squeeze-all depends on per-sample shape
        return ["".join(ch for i, ch in enumerate(layout) if i not in set(axes))]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        ndim = inp.data.ndim - 1
        axes = _squeeze_axes(self.spec, inp.layout, ndim)
        if axes is None:
            axes = [i for i, s in enumerate(inp.data.shape[1:]) if s == 1]
        x = jnp.squeeze(inp.data, axis=tuple(a + 1 for a in axes))
        shapes = inp.shapes
        layout = ""
        if shapes is not None:
            keep = [i for i in range(ndim) if i not in set(axes)]
            shapes = shapes[:, keep]
        if inp.layout:
            layout = "".join(ch for i, ch in enumerate(inp.layout)
                             if i not in set(axes))
        return [DeviceBatch(x, shapes, layout)]


# ==================================== Transpose ======================================================

DALI_SCHEMA("Transpose").DocStr(
    "Permutes sample dims (reference generic/transpose/)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddArg(
    "perm", ArgType.INT_VEC, "Dimension permutation."
).AddOptionalArg(
    "transpose_layout", ArgType.BOOL, "Also permute the layout string.", True
).AddOptionalArg(
    "output_layout", ArgType.STRING,
    "Explicit output layout (overrides transpose_layout; reference "
    "generic/transpose/transpose.cc `output_layout`).", None)




def _transpose_layout(spec, in_layout: str) -> str:
    explicit = spec.GetArgument("output_layout", None)
    if explicit:
        return explicit
    if in_layout and spec.GetArgument("transpose_layout", True):
        perm = spec.GetArgument("perm")
        return "".join(in_layout[p] for p in perm)
    return in_layout


@register_operator("Transpose", "cpu")
class TransposeCPU(Operator):
    def run_sample(self, ctx, idx, x):
        return np.ascontiguousarray(np.transpose(x, self.spec.GetArgument("perm")))

    def output_layout(self, output_idx, inputs):
        return _transpose_layout(self.spec, inputs[0].layout if inputs else "")


@register_operator("Transpose", "gpu")
class TransposeGPU(Operator):
    def host_output_layouts(self, in_layouts):
        return [_transpose_layout(self.spec, in_layouts[0] if in_layouts else "")]

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        perm = self.spec.GetArgument("perm")
        x = jnp.transpose(inp.data, (0, *(p + 1 for p in perm)))
        layout = _transpose_layout(self.spec, inp.layout)
        shapes = inp.shapes[:, list(perm)] if inp.shapes is not None else None
        return [DeviceBatch(x, shapes, layout)]


# ==================================== OneHot =========================================================

DALI_SCHEMA("OneHot").DocStr("One-hot encoding (reference generic/one_hot.cc).").NumInput(1).NumOutput(
    1
).Devices("cpu", "gpu").AddOptionalArg(
    "num_classes", ArgType.INT, "Number of classes.", 0
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT
).AddOptionalArg(
    "on_value", ArgType.FLOAT, "Value for the hot position.", 1.0
).AddOptionalArg(
    "off_value", ArgType.FLOAT, "Value elsewhere.", 0.0
).AddOptionalArg(
    "axis", ArgType.INT, "Axis for the new dim.", -1
).AddOptionalArg(
    "axis_name", ArgType.STRING,
    "Single-character layout name for the new axis (reference "
    "generic/one_hot.cc `axis_name`): inserted into the output layout when "
    "the input layout is known.", None)


def _one_hot_layout(spec, inputs) -> str:
    name = spec.GetArgument("axis_name", None)
    in_layout = inputs[0].layout if inputs else ""
    if not name:
        return ""
    if len(name) != 1:
        raise ValueError("OneHot axis_name must be a single character")
    axis = spec.GetArgument("axis", -1)
    if in_layout:
        pos = len(in_layout) if axis < 0 else axis
        return in_layout[:pos] + name + in_layout[pos:]
    return name


@register_operator("OneHot", "cpu")
class OneHotCPU(Operator):
    def output_layout(self, output_idx, inputs):
        return _one_hot_layout(self.spec, inputs)

    def run_sample(self, ctx, idx, x):
        nc = self.spec.GetArgument("num_classes")
        on = self.spec.GetArgument("on_value", 1.0)
        off = self.spec.GetArgument("off_value", 0.0)
        dt = to_numpy_type(self.spec.GetArgument("dtype", DALIDataType.FLOAT))
        flat = int(np.asarray(x).reshape(-1)[0]) if x.size == 1 else None
        if flat is not None:
            out = np.full((nc,), off, dtype=dt)
            out[flat] = on
            return out
        out = np.full((*x.shape, nc), off, dtype=dt)
        np.put_along_axis(out, x[..., None].astype(np.int64), on, axis=-1)
        return out


@register_operator("OneHot", "gpu")
class OneHotGPU(Operator):
    def host_output_layouts(self, in_layouts):
        class _L:  # _one_hot_layout consumes objects with a .layout attribute
            layout = in_layouts[0] if in_layouts else ""
        return [_one_hot_layout(self.spec, [_L])]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        nc = self.spec.GetArgument("num_classes")
        on = self.spec.GetArgument("on_value", 1.0)
        off = self.spec.GetArgument("off_value", 0.0)
        dt = to_jnp_type(self.spec.GetArgument("dtype", DALIDataType.FLOAT))
        x = inp.data
        if x.ndim == 2 and x.shape[1] == 1:
            x = x[:, 0]
        oh = jax.nn.one_hot(x.astype(jnp.int32), nc)
        out = (oh * (on - off) + off).astype(dt)
        return [DeviceBatch(out, None, _one_hot_layout(self.spec, [inp]))]


# ==================================== Pad ==============================================================

DALI_SCHEMA("Pad").DocStr(
    "Pads samples to equal (or aligned) extents (reference generic/pad.cc). On the "
    "device side batches are already padded to the canvas; this op makes the batch "
    "officially uniform."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "fill_value", ArgType.FLOAT, "Padding value.", 0.0
).AddOptionalArg(
    "axes", ArgType.INT_VEC, "Axes to pad (default: all).", None
).AddOptionalArg(
    "axis_names", ArgType.TENSOR_LAYOUT,
    "Axes to pad named by layout letter (alternative to `axes`; reference "
    "pad.cc `axis_names`).", None
).AddOptionalArg(
    "align", ArgType.INT_VEC, "Alignment per axis.", None
).AddOptionalArg("shape", ArgType.INT_VEC, "Minimum output shape.", None)


def _pad_axes(spec, layout, ndim):
    names = spec.GetArgument("axis_names", None)
    if names:
        if not layout:
            raise ValueError("Pad: axis_names requires a layout on the input")
        return [layout.index(ch) for ch in names]
    axes = spec.GetArgument("axes", None)
    return list(range(ndim)) if not axes else [a % ndim for a in axes]


@register_operator("Pad", "cpu")
class PadCPU(Operator):
    def run_batch(self, ctx, inp: HostBatch):
        shapes = inp.shapes()
        ndim = shapes.shape[1]
        axes = _pad_axes(self.spec, inp.layout or "", ndim)
        align = self.spec.GetArgument("align", None)
        req_shape = self.spec.GetArgument("shape", None)
        target = shapes.max(axis=0)
        if req_shape:
            for k, a2 in enumerate(axes):
                if k < len(req_shape) and req_shape[k] > 0:
                    target[a2] = max(target[a2], req_shape[k])
        if align:
            for i, d in enumerate(axes):
                a = align[i] if i < len(align) else align[-1]
                target[d] = ((target[d] + a - 1) // a) * a
        fill = self.spec.GetArgument("fill_value", 0.0)
        out = []
        for s in inp.samples:
            pads = []
            for d in range(ndim):
                pads.append((0, (int(target[d]) - s.shape[d]) if d in axes else 0))
            out.append(np.pad(s, pads, constant_values=fill).astype(s.dtype))
        return [HostBatch(out, layout=inp.layout)]


@register_operator("Pad", "gpu")
class PadGPU(Operator):
    """Device pad: the staging canvas is already physically padded, but with
    staging zeros and canvas-sized extents — so (a) regions between each
    sample's extent and the pad target are rewritten with ``fill_value`` via
    iota masks, (b) the canvas grows if ``shape``/``align`` exceed it, and
    (c) output extents are the pad target in padded axes, ragged elsewhere
    (reference generic/pad.cc semantics)."""

    def _targets(self, shapes, layout=""):
        ndim = shapes.shape[1]
        if self.spec.GetArgument("axis_names", None) and not layout:
            raise ValueError(
                "Pad(gpu): axis_names requires an input with a known layout; "
                "pass `axes` instead")
        axes = _pad_axes(self.spec, layout, ndim)
        align = self.spec.GetArgument("align", None)
        req_shape = self.spec.GetArgument("shape", None)
        target = shapes.max(axis=0).astype(np.int64)
        if req_shape:
            # shape entries correspond to positions in `axes` (reference Pad:
            # "extents of the output in the axes specified by axes"; -1/0 = keep)
            for k, a in enumerate(axes):
                if k < len(req_shape) and req_shape[k] > 0:
                    target[a] = max(target[a], int(req_shape[k]))
        if align:
            for i, d in enumerate(axes):
                a = align[i] if i < len(align) else align[-1]
                target[d] = ((target[d] + a - 1) // a) * a
        return axes, target

    def _in_layout(self, ctx, input_batches):
        b = input_batches[0] if input_batches else None
        layout = getattr(b, "layout", "") or ""
        if not layout:
            # statically-propagated layout (executor Setup pass) covers
            # device-to-device edges, e.g. pad after mixed decode
            lays = ctx.in_layouts(self)
            layout = lays[0] if lays else ""
        return layout

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        shapes = input_shapes[0]
        if shapes is None:
            return None
        shapes = np.asarray(shapes)
        axes, target = self._targets(shapes, self._in_layout(ctx, input_batches))
        out = shapes.copy()
        for d in axes:
            out[:, d] = target[d]
        return [out]

    def device_statics(self, ctx, input_shapes, input_batches=None):
        shapes = np.asarray(input_shapes[0])
        axes, target = self._targets(shapes, self._in_layout(ctx, input_batches))
        return (tuple(axes), tuple(int(t) for t in target))

    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        axes, target = dctx.static(self)
        ndim = len(inp.canvas)
        fill = self.spec.GetArgument("fill_value", 0.0)
        data = inp.data
        fillv = jnp.asarray(fill).astype(data.dtype)
        grow = [(0, 0)] + [
            (0, max(0, target[d] - inp.canvas[d]) if d in axes else 0)
            for d in range(ndim)
        ]
        if any(g[1] for g in grow):
            data = jnp.pad(data, grow, constant_values=fill)
        if inp.shapes is not None:
            mask = None
            n = data.shape[0]
            for d in axes:
                size = data.shape[1 + d]
                m = jnp.arange(size)[None] >= inp.shapes[:, d, None]  # [N, size]
                m = m.reshape((n,) + (1,) * d + (size,) + (1,) * (ndim - d - 1))
                mask = m if mask is None else (mask | m)
            data = jnp.where(mask, fillv, data)
            tgt = jnp.asarray(target, inp.shapes.dtype)
            cols = jnp.asarray([d in axes for d in range(ndim)])
            out_shapes = jnp.where(cols[None], tgt[None], inp.shapes)
        else:
            out_shapes = None
        # The staging canvas may be quantized well past the pad target (grow
        # policy rounds spatial dims up); slice padded axes down to the exact
        # target so `as_tensor()` extents match the cpu path. `target` is a
        # trace-time static (device_statics), so this adds no recompiles.
        crop = tuple(
            slice(0, int(target[d])) if d in axes and int(target[d]) < data.shape[1 + d]
            else slice(None)
            for d in range(ndim)
        )
        if any(s != slice(None) for s in crop):
            data = data[(slice(None),) + crop]
        return [DeviceBatch(data, out_shapes, inp.layout)]


# ==================================== _TensorSubscript ===================================================


def _subscript_schema():
    s = DALI_SCHEMA("_TensorSubscript").DocStr(
        "Per-sample indexing/slicing (reference generic/subscript.cc)."
    ).NumInput(1, 8).NumOutput(1).Devices("cpu", "gpu").MakeInternal().AddOptionalArg(
        "num_subscripts", ArgType.INT, "Number of subscripted dims.", 1
    )
    for d in range(8):
        s.AddOptionalArg(f"at_{d}", ArgType.INT, "", None, tensor_ok=True, per_sample=True)
        s.AddOptionalArg(f"lo_{d}", ArgType.INT, "", None, tensor_ok=True, per_sample=True)
        s.AddOptionalArg(f"hi_{d}", ArgType.INT, "", None, tensor_ok=True, per_sample=True)
    return s


_subscript_schema()


@register_operator("_TensorSubscript", "cpu")
class TensorSubscriptCPU(Operator):
    def run_sample(self, ctx, idx, x, *extra):
        nd = self.spec.GetArgument("num_subscripts", 1)
        slices = []
        for d in range(nd):
            at = ctx.arg(self, f"at_{d}", idx, None)
            if at is not None:
                slices.append(int(np.asarray(at)))
                continue
            lo = ctx.arg(self, f"lo_{d}", idx, None)
            hi = ctx.arg(self, f"hi_{d}", idx, None)
            slices.append(slice(None if lo is None else int(np.asarray(lo)),
                                None if hi is None else int(np.asarray(hi))))
        return np.ascontiguousarray(x[tuple(slices)])
