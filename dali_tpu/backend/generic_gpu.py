"""Device (gpu) lowerings for the generic operator family that previously only
had host implementations: Slice, Erase, Paste, _TensorSubscript, the
Zeros/Ones/Full value ops, BbFlip and BoxEncoder.

Reference: ``dali/operators/generic/slice.cc``, ``generic/erase/erase.cc``,
``image/paste/paste.cc``, ``generic/subscript.cc``, ``generic/constant_value.cc``,
``bbox/bb_flip.cu``, ``ssd/box_encoder.cu`` — each has a GPU backend there; here
the device path is an XLA lowering over the padded-canvas batch.

Ragged outputs (Slice/Paste/_TensorSubscript) use the same grow-canvas policy as
Resize(gpu): the host computes per-sample output extents (``host_params``), the
canvas maximum enters the jit cache key (``device_statics``) and only grows, so
XLA recompiles a bounded number of times while per-sample extents ride along as
ordinary device data.
"""

from __future__ import annotations

import numpy as np

from .._schema import register_operator
from ..batch import DeviceBatch
from ..types import to_jnp_type, to_numpy_type
from .base import Operator
from .bbox import BbFlipCPU
from .generic2 import _slice_axes


def _round_up(v, align=8):
    return int(-(-int(v) // align) * align)


def _per_sample_f32(dctx, op, name, default, n):
    """Argument as a [N] float32 device vector (tensor arg or broadcast const)."""
    import jax.numpy as jnp

    v = dctx.arg(op, name, default)
    if dctx.has_tensor_arg(op, name):
        return jnp.asarray(v, jnp.float32).reshape(n, -1)[:, 0]
    return jnp.full((n,), float(np.asarray(v).reshape(-1)[0]), jnp.float32)


# ======================================== Slice (gpu) =============================================


class _GrowCanvasOp(Operator):
    """Shared grow-canvas state for device ops with ragged outputs."""

    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._grow = {}

    def _grow_to(self, dim, value, align=8):
        cur = self._grow.get(dim, 0)
        self._grow[dim] = max(cur, _round_up(value, align))
        return self._grow[dim]


@register_operator("Slice", "gpu")
class SliceGPU(_GrowCanvasOp):
    """Device slice: host computes per-sample (anchor, shape) from the kwargs
    (reference slice_attr.h SliceArgsHelper); the device program does one
    clamped dynamic_slice per sample onto a grow-policy canvas and masks the
    out-of-bounds region for the "pad" policy."""

    def _resolve_windows(self, ctx, shapes):
        spec = self.spec
        n, ndim = shapes.shape
        lays = ctx.in_layouts(self)
        axes = _slice_axes(spec, lays[0] if lays else "", ndim)
        na = len(axes)
        dims = shapes[:, axes].astype(np.float64)  # [n, na]

        def geta(name):
            vals = []
            for i in range(n):
                v = ctx.arg(self, name, i, None)
                if v is None:
                    return None
                vals.append(np.asarray(v, np.float64).reshape(-1))
            return np.stack(vals, 0)

        anchor = geta("start")
        if anchor is None:
            ra = geta("rel_start")
            anchor = ra * dims if ra is not None else np.zeros((n, na))
        shape = geta("shape")
        if shape is None:
            rs = geta("rel_shape")
            shape = rs * dims if rs is not None else None
        if shape is None:
            end = geta("end")
            if end is None:
                re = geta("rel_end")
                end = re * dims if re is not None else None
            shape = (end - anchor) if end is not None else None
        if shape is None:
            shape = dims - anchor
        anchor = np.round(anchor).astype(np.int64)
        shape = np.maximum(np.round(shape).astype(np.int64), 0)
        policy = spec.GetArgument("out_of_bounds_policy", "error")
        if policy == "error":
            if (anchor < 0).any() or (anchor + shape > dims).any():
                raise ValueError("Slice(gpu): window out of bounds (policy 'error')")
        if policy == "trim_to_shape":
            hi = np.minimum(anchor + shape, dims.astype(np.int64))
            lo = np.maximum(anchor, 0)
            anchor, shape = lo, np.maximum(hi - lo, 0)
        return axes, anchor.astype(np.int32), shape.astype(np.int32)

    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError("Slice(gpu) requires host-known input shapes")
        if len(input_shapes) > 1:  # actual inputs (eager spec has none)
            raise NotImplementedError(
                "Slice(gpu): pass anchor/shape as kwargs (start=/shape=/rel_*), "
                "not positional inputs"
            )
        axes, anchor, shp = self._resolve_windows(ctx, shapes)
        out = shapes.copy().astype(np.int32)
        out[:, axes] = shp
        self._axes = axes
        # grow canvas per sliced axis (executor calls host_params before
        # device_statics, so the statics are ready when asked for)
        self._pending_statics = tuple(
            self._grow_to(k, max(int(shp[:, k].max()), 1)) for k in range(shp.shape[1])
        )
        self._last_out = out
        return {"slice_anchor": anchor, "slice_out": out}

    def device_statics(self, ctx, input_shapes):
        return getattr(self, "_pending_statics", None)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [getattr(self, "_last_out", None)]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        anchor = dctx.param(self, "slice_anchor")  # [n, na]
        out_ext = dctx.param(self, "slice_out")  # [n, ndim]
        axes = self._axes
        canvas = inp.canvas
        statics = dctx.static(self)
        sizes = list(canvas)
        for k, a in enumerate(axes):
            # the output canvas may EXCEED the input canvas ("pad" windows
            # larger than the image): the gather below clips + masks
            sizes[a] = statics[k]
        n = inp.batch_size
        policy = self.spec.GetArgument("out_of_bounds_policy", "error")
        fill = float(self.spec.GetArgument("fill_values", [0.0])[0])

        in_ext = inp.shapes if inp.shapes is not None else jnp.tile(
            jnp.array([list(canvas)], jnp.int32), (n, 1)
        )

        def one(img, anc, oext, ext):
            out = img
            masks = []
            for k, a in enumerate(axes):
                coord = anc[k] + jnp.arange(sizes[a])  # desired source coords
                out = jnp.take(out, jnp.clip(coord, 0, canvas[a] - 1), axis=a)
                valid = (coord >= 0) & (coord < ext[a]) & (
                    jnp.arange(sizes[a]) < oext[a]
                )
                masks.append((valid, a))
            if policy == "pad":
                vm = jnp.ones(out.shape, bool)
                for valid, a in masks:
                    sh = [1] * out.ndim
                    sh[a] = -1
                    vm &= valid.reshape(sh)
                out = jnp.where(vm, out, jnp.asarray(fill, out.dtype))
            return out

        out = jax.vmap(one)(inp.data, anchor, out_ext, in_ext)
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_jnp_type(dt))
        return [DeviceBatch(out, out_ext, inp.layout)]


# ======================================== _TensorSubscript (gpu) ==================================


@register_operator("_TensorSubscript", "gpu")
class TensorSubscriptGPU(_GrowCanvasOp):
    """Device subscript (reference generic/subscript.cc GPU backend): per-sample
    lo/hi windows become one dynamic_slice; `at_d` indices slice size 1 and drop
    the dim."""

    def _windows(self, ctx, shapes):
        nd = self.spec.GetArgument("num_subscripts", 1)
        n = shapes.shape[0]
        lo = np.zeros((n, nd), np.int64)
        ln = np.zeros((n, nd), np.int64)
        drop = []
        for d in range(nd):
            at0 = ctx.arg(self, f"at_{d}", 0, None)
            if at0 is not None:
                drop.append(d)
            for i in range(n):
                dim = int(shapes[i, d])
                at = ctx.arg(self, f"at_{d}", i, None)
                if at is not None:
                    a = int(np.asarray(at))
                    lo[i, d], ln[i, d] = (a % dim if dim else 0), 1
                    continue
                l = ctx.arg(self, f"lo_{d}", i, None)
                h = ctx.arg(self, f"hi_{d}", i, None)
                l = 0 if l is None else int(np.asarray(l)) % (dim or 1) if int(np.asarray(l)) < 0 else int(np.asarray(l))
                h = dim if h is None else int(np.asarray(h)) % (dim or 1) if int(np.asarray(h)) < 0 else min(int(np.asarray(h)), dim)
                lo[i, d], ln[i, d] = l, max(h - l, 0)
        return lo, ln, drop

    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError("subscript(gpu) requires host-known input shapes")
        lo, ln, drop = self._windows(ctx, shapes)
        self._drop = drop
        self._pending_statics = tuple(
            self._grow_to(d, max(int(ln[:, d].max()), 1)) for d in range(ln.shape[1])
        )
        out = shapes.copy().astype(np.int32)
        out[:, : ln.shape[1]] = ln
        keep = [d for d in range(shapes.shape[1]) if d not in drop]
        self._keep = keep
        self._last_out = out[:, keep] if keep else out[:, :0]
        return {"sub_lo": lo.astype(np.int32), "sub_out": self._last_out}

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [getattr(self, "_last_out", None)]

    def device_statics(self, ctx, input_shapes):
        return getattr(self, "_pending_statics", None)

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        lo = dctx.param(self, "sub_lo")
        out_ext = dctx.param(self, "sub_out")
        statics = dctx.static(self)
        canvas = inp.canvas
        nd = len(statics)
        sizes = list(canvas)
        for d in range(nd):
            sizes[d] = 1 if d in self._drop else min(statics[d], canvas[d])

        def one(img, l):
            out = img
            for d in range(nd):
                coord = jnp.clip(l[d] + jnp.arange(sizes[d]), 0, canvas[d] - 1)
                out = jnp.take(out, coord, axis=d)
            return out.squeeze(axis=tuple(self._drop)) if self._drop else out

        out = jax.vmap(one)(inp.data, lo)
        shapes = out_ext if out_ext.shape[1] else None
        return [DeviceBatch(out, shapes, "")]


# ======================================== Erase (gpu) =============================================


@register_operator("Erase", "gpu")
class EraseGPU(Operator):
    """Device erase: regions become broadcast-iota masks, one `where` per batch
    (reference erase.cc GPU backend). Shape-preserving, so it composes with any
    canvas raggedness."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]  # shape-preserving

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        spec = self.spec
        ndim = len(inp.canvas)
        axes = spec.GetArgument("axes", None)
        names = spec.GetArgument("axis_names", None)
        if names and not axes:
            if not inp.layout:
                raise ValueError(
                    f"Erase: axis_names={names!r} requires a layout on the "
                    "input; pass `axes` (by index) instead")
            axes = [inp.layout.index(c) for c in names]
        if not axes:
            axes = list(range(min(2, ndim)))
        axes = sorted(a % ndim for a in axes)
        na = len(axes)
        n = inp.batch_size

        def region_arg(name):
            v = dctx.arg(self, name, None)
            if v is None:
                return None
            arr = jnp.asarray(v, jnp.float32)
            if dctx.has_tensor_arg(self, name):
                return arr.reshape(n, -1, na)
            return jnp.broadcast_to(arr.reshape(1, -1, na), (n, arr.size // na, na))

        anchor = region_arg("anchor")
        shape = region_arg("shape")
        if anchor is None or shape is None:
            return [inp]
        normalized = spec.GetArgument("normalized", False)
        ext = inp.shapes if inp.shapes is not None else jnp.tile(
            jnp.array([list(inp.canvas)], jnp.int32), (n, 1)
        )
        dims = ext[:, axes].astype(jnp.float32)[:, None, :]  # [n,1,na]
        if normalized or spec.GetArgument("normalized_anchor", False):
            anchor = anchor * dims
        if normalized or spec.GetArgument("normalized_shape", False):
            shape = shape * dims
        if spec.GetArgument("centered_anchor", False):
            anchor = anchor - shape / 2
        lo = jnp.round(anchor)
        hi = lo + jnp.round(shape)

        mask = jnp.zeros((n,) + tuple(inp.canvas[a] for a in axes), bool)
        R = lo.shape[1]
        for r in range(R):
            m = jnp.ones(mask.shape, bool)
            for k in range(na):
                idx = jax.lax.broadcasted_iota(jnp.float32, mask.shape, 1 + k)
                m &= (idx >= lo[:, r, k].reshape((n,) + (1,) * na)) & (
                    idx < hi[:, r, k].reshape((n,) + (1,) * na)
                )
            mask |= m
        # broadcast mask over the non-axes dims
        mshape = [n] + [inp.canvas[d] if d in axes else 1 for d in range(ndim)]
        mask = mask.reshape(mshape)

        fill = spec.GetArgument("fill_value", [0.0])
        fv = jnp.asarray(fill, inp.data.dtype)
        if fv.size > 1:
            fv = fv.reshape((1,) * ndim + (-1,))
        out = jnp.where(mask, fv, inp.data)
        return [inp.with_data(out)]


# ======================================== Paste (gpu) =============================================


@register_operator("Paste", "gpu")
class PasteGPU(_GrowCanvasOp):
    """Device paste onto a grow-policy canvas (reference paste.cu): fill + one
    dynamic_update_slice per sample."""

    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError("Paste(gpu) requires host-known input shapes")
        n = shapes.shape[0]
        mins = int(self.spec.GetArgument("min_canvas_size", 0.0))
        out = np.zeros((n, 3), np.int32)
        pos = np.zeros((n, 2), np.int32)
        for i in range(n):
            r = float(np.asarray(ctx.arg(self, "ratio", i, 1.0)))
            px = float(np.asarray(ctx.arg(self, "paste_x", i, 0.5)))
            py = float(np.asarray(ctx.arg(self, "paste_y", i, 0.5)))
            h, w = int(shapes[i, 0]), int(shapes[i, 1])
            ch = max(int(round(h * r)), mins, h)
            cw = max(int(round(w * r)), mins, w)
            out[i] = (ch, cw, shapes[i, 2] if shapes.shape[1] > 2 else 0)
            pos[i] = (int(round(py * (ch - h))), int(round(px * (cw - w))))
        self._pending_statics = (
            self._grow_to(0, out[:, 0].max(), 32),
            self._grow_to(1, out[:, 1].max(), 32),
        )
        self._last_out = out
        return {"paste_pos": pos, "paste_out": out}

    def device_statics(self, ctx, input_shapes):
        return getattr(self, "_pending_statics", None)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [getattr(self, "_last_out", None)]

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        pos = dctx.param(self, "paste_pos")
        out_ext = dctx.param(self, "paste_out")
        ch, cw = dctx.static(self)
        n, H, W, C = inp.data.shape
        fill = self.spec.GetArgument("fill_value", [0.0])
        fv = jnp.asarray(fill).astype(inp.data.dtype)
        canvas = jnp.broadcast_to(
            fv.reshape(1, 1, -1) if fv.size > 1 else fv.reshape(1, 1, 1), (ch, cw, C)
        )
        ext = inp.shapes if inp.shapes is not None else jnp.tile(
            jnp.array([[H, W, C]], jnp.int32), (n, 1)
        )

        def one(img, p, e):
            # gather: out[y, x] = img[y - py, x - px] where inside the pasted box
            g = jnp.take(img, jnp.clip(jnp.arange(ch) - p[0], 0, H - 1), axis=0)
            g = jnp.take(g, jnp.clip(jnp.arange(cw) - p[1], 0, W - 1), axis=1)
            iy = jax.lax.broadcasted_iota(jnp.int32, (ch, cw, C), 0)
            ix = jax.lax.broadcasted_iota(jnp.int32, (ch, cw, C), 1)
            inside = (iy >= p[0]) & (iy < p[0] + e[0]) & (ix >= p[1]) & (ix < p[1] + e[1])
            return jnp.where(inside, g, canvas)

        out = jax.vmap(one)(inp.data, pos, ext)
        nc = self.spec.GetArgument("n_channels", None)
        if nc is not None and int(nc) > C:
            extra = int(nc) - C
            fpad = jnp.broadcast_to(
                (fv.reshape(-1)[C:] if fv.size >= int(nc) else fv.reshape(-1)[-1:]),
                (extra,)).astype(out.dtype)
            out = jnp.concatenate(
                [out, jnp.broadcast_to(fpad, out.shape[:-1] + (extra,))], axis=-1)
            out_ext = np.concatenate(
                [out_ext[:, :2], np.full((out_ext.shape[0], 1), int(nc), out_ext.dtype)], 1)
        return [DeviceBatch(out, out_ext, inp.layout or "HWC")]


# ======================================== value ops (gpu) =========================================


class _ValueOpGPU(Operator):
    fill = 0.0
    like = False

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        if self.like:
            return [input_shapes[0]]
        shp = self.spec.GetArgument("shape", None)
        if shp is None:
            return None
        shape = np.asarray(shp, np.int32).reshape(-1)
        return [np.tile(shape, (ctx.batch_size, 1))]

    def lower(self, dctx, *inputs):
        import jax.numpy as jnp

        n = dctx.batch_size
        dt_arg = self.spec.GetArgument("dtype", None)
        if self.like:
            inp = inputs[0]
            dt = to_jnp_type(dt_arg) if dt_arg is not None else inp.data.dtype
            fv = self._fill_value(dctx, n, jnp)
            if fv.ndim == 2 and fv.shape[1] > 1:  # vector fill → last dim
                fv = fv.reshape((n,) + (1,) * (inp.data.ndim - 2) + (fv.shape[1],))
            else:
                fv = fv.reshape((n,) + (1,) * (inp.data.ndim - 1))
            out = jnp.broadcast_to(fv.astype(dt), inp.data.shape)
            return [DeviceBatch(out, inp.shapes, inp.layout)]
        if dctx.has_tensor_arg(self, "shape"):
            raise NotImplementedError(
                f"{type(self).__name__}: per-sample `shape` on gpu is not supported — "
                "generate on cpu and .gpu() the result"
            )
        shp = self.spec.GetArgument("shape", None)
        shape = tuple(int(v) for v in np.asarray(shp).reshape(-1)) if shp is not None else ()
        fv = self._fill_value(dctx, n, jnp)
        if dt_arg is not None:
            dt = to_jnp_type(dt_arg)
        elif self.fill is None:  # Full: dtype follows the fill value (like cpu)
            dt = fv.dtype
        else:
            dt = jnp.int32
        if fv.ndim == 2 and fv.shape[1] > 1:
            if not shape:
                shape = (fv.shape[1],)
            fv = fv.reshape((n,) + (1,) * (len(shape) - 1) + (fv.shape[1],))
        else:
            fv = fv.reshape((n,) + (1,) * len(shape))
        out = jnp.broadcast_to(fv.astype(dt), (n,) + shape)
        return [DeviceBatch(out, None, "")]

    def _fill_value(self, dctx, n, jnp):
        """[n] scalar fills, or [n, k] when fill_value is a k-vector (matching
        the cpu backend's last-dim broadcast)."""
        if self.fill is not None:
            return jnp.full((n,), self.fill)
        v = dctx.arg(self, "fill_value", 0.0)
        if dctx.has_tensor_arg(self, "fill_value"):
            return jnp.asarray(v).reshape(n, -1)
        arr = np.asarray(v, np.float32).reshape(-1)
        if arr.size > 1:
            return jnp.asarray(np.broadcast_to(arr[None, :], (n, arr.size)))
        return jnp.full((n,), float(arr[0]))


for _nm, _fill, _like in (
    ("Zeros", 0.0, False),
    ("Ones", 1.0, False),
    ("Full", None, False),
    ("ZerosLike", 0.0, True),
    ("OnesLike", 1.0, True),
    ("FullLike", None, True),
):
    register_operator(_nm, "gpu")(type(_nm + "GPU", (_ValueOpGPU,), {"fill": _fill, "like": _like}))


# ======================================== BbFlip (gpu) ============================================


@register_operator("BbFlip", "gpu")
class BbFlipGPU(Operator):
    """Device bbox flip (reference bb_flip.cu): elementwise on the padded [N,M,4]
    box batch; padded rows are masked back to their original values."""

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [input_shapes[0]]  # shape-preserving

    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        n = inp.batch_size
        boxes = inp.data.reshape(n, -1, 4).astype(jnp.float32)
        h = _per_sample_f32(dctx, self, "horizontal", 1, n) != 0
        v = _per_sample_f32(dctx, self, "vertical", 0, n) != 0
        ltrb = self.spec.GetArgument("ltrb", False)
        x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
        if ltrb:
            fx0, fx1 = 1.0 - x1, 1.0 - x0
            fy0, fy1 = 1.0 - y1, 1.0 - y0
        else:
            fx0, fx1 = 1.0 - x0 - x1, x1
            fy0, fy1 = 1.0 - y0 - y1, y1
        hb = h[:, None]
        vb = v[:, None]
        out = jnp.stack(
            [
                jnp.where(hb, fx0, x0),
                jnp.where(vb, fy0, y0),
                jnp.where(hb, fx1, x1),
                jnp.where(vb, fy1, y1),
            ],
            axis=-1,
        )
        if inp.shapes is not None:
            m = jax.lax.broadcasted_iota(jnp.int32, out.shape[:2], 1) < (
                inp.shapes[:, 0] // (1 if inp.data.ndim == 3 else 4)
            ).reshape(n, 1)
            out = jnp.where(m[..., None], out, boxes)
        return [DeviceBatch(out.reshape(inp.data.shape), inp.shapes, inp.layout)]


# ======================================== BoxEncoder (gpu) ========================================


@register_operator("BoxEncoder", "gpu")
class BoxEncoderGPU(Operator):
    """Device SSD anchor matching (reference ssd/box_encoder.cu): the [M,A] IoU
    matrix is batched matmul-shaped work the MXU/VPU handles well; invalid
    (padding) boxes are masked out of the argmax."""

    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._anchors = np.asarray(spec.GetArgument("anchors"), np.float32).reshape(-1, 4)

    def lower(self, dctx, boxes_b: DeviceBatch, labels_b: DeviceBatch):
        import jax
        import jax.numpy as jnp

        anchors = jnp.asarray(self._anchors)
        A = anchors.shape[0]
        n = boxes_b.batch_size
        boxes = boxes_b.data.reshape(n, -1, 4).astype(jnp.float32)
        M = boxes.shape[1]
        labels = labels_b.data.reshape(n, -1).astype(jnp.int32)
        if boxes_b.shapes is not None:
            counts = boxes_b.shapes[:, 0]
            if boxes_b.data.ndim == 2:  # flattened [M*4]
                counts = counts // 4
        else:
            counts = jnp.full((n,), M, jnp.int32)
        criteria = float(self.spec.GetArgument("criteria", 0.5))
        offset = self.spec.GetArgument("offset", False)
        means = jnp.asarray(self.spec.GetArgument("means", [0.0] * 4), jnp.float32)
        stds = jnp.asarray(self.spec.GetArgument("stds", [1.0] * 4), jnp.float32)
        scale = float(self.spec.GetArgument("scale", 1.0))
        area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])

        def one(b, lab, cnt):
            valid = jnp.arange(M) < cnt
            ix1 = jnp.maximum(b[:, None, 0], anchors[None, :, 0])
            iy1 = jnp.maximum(b[:, None, 1], anchors[None, :, 1])
            ix2 = jnp.minimum(b[:, None, 2], anchors[None, :, 2])
            iy2 = jnp.minimum(b[:, None, 3], anchors[None, :, 3])
            inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
            area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[:, None]
            iou = inter / jnp.maximum(area_b + area_a[None] - inter, 1e-9)
            iou = jnp.where(valid[:, None], iou, -1.0)  # [M, A]
            best_box = jnp.argmax(iou, axis=0)
            best_iou = jnp.max(iou, axis=0)
            # forced match: each valid gt box claims its best anchor
            best_anchor = jnp.argmax(iou, axis=1)  # [M]
            idx = jnp.where(valid, best_anchor, A)  # OOB rows drop in the scatter
            best_iou = best_iou.at[idx].set(2.0, mode="drop")
            best_box = best_box.at[idx].set(jnp.arange(M), mode="drop")
            matched = best_iou >= criteria
            ob = jnp.where(matched[:, None], b[best_box], anchors)
            ol = jnp.where(matched, lab[best_box], 0)
            if offset:
                def xywh(t):
                    return jnp.stack(
                        [(t[:, 0] + t[:, 2]) / 2, (t[:, 1] + t[:, 3]) / 2,
                         t[:, 2] - t[:, 0], t[:, 3] - t[:, 1]], axis=1)

                g = xywh(ob * scale)
                aa = xywh(anchors * scale)
                enc = jnp.stack(
                    [(g[:, 0] - aa[:, 0]) / aa[:, 2],
                     (g[:, 1] - aa[:, 1]) / aa[:, 3],
                     jnp.log(jnp.maximum(g[:, 2], 1e-9) / aa[:, 2]),
                     jnp.log(jnp.maximum(g[:, 3], 1e-9) / aa[:, 3])], axis=1)
                return (enc - means) / stds, ol
            return ob * scale, ol

        out_b, out_l = jax.vmap(one)(boxes, labels, counts)
        return [DeviceBatch(out_b, None, ""), DeviceBatch(out_l, None, "")]
