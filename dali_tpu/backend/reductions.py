"""Reduction operators (reference ``dali/operators/generic/reduce/`` —
``reductions__{Sum,Mean,Max,Min,StdDev,Variance,MeanSquare,RootMeanSquare}``).
On TPU these are plain XLA reductions; the reference's multi-stage GPU reduction
trees (~6k LoC CUDA) are the compiler's job here.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import to_jnp_type, to_numpy_type
from .base import Operator


def _reduce_schema(name, doc, has_ddof=False):
    s = (
        DALI_SCHEMA(f"reductions.{name}")
        .DocStr(doc)
        .NumInput(1 if not has_ddof else 1, 2 if has_ddof else 1)
        .NumOutput(1)
        .Devices("cpu", "gpu")
        .AddOptionalArg("axes", ArgType.INT_VEC, "Reduction axes (default: all).", None)
        .AddOptionalArg("axis_names", ArgType.TENSOR_LAYOUT, "Axes by layout name.", None)
        .AddOptionalArg("keep_dims", ArgType.BOOL, "Keep reduced dims as size 1.", False)
        .AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", None)
    )
    if has_ddof:
        s.AddOptionalArg("ddof", ArgType.INT, "Delta degrees of freedom.", 0)
    return s


_reduce_schema("Sum", "Sum reduction (reference reduce.cc).")
_reduce_schema("Mean", "Mean reduction.")
_reduce_schema("Max", "Max reduction.")
_reduce_schema("Min", "Min reduction.")
_reduce_schema("MeanSquare", "Mean of squares.")
_reduce_schema("RootMeanSquare", "Root mean square.")
_reduce_schema("StdDev", "Standard deviation w.r.t. provided mean.", has_ddof=True)
_reduce_schema("Variance", "Variance w.r.t. provided mean.", has_ddof=True)


def _axes_of(spec, ndim, layout=""):
    names = spec.GetArgument("axis_names", None)
    if names:
        if not layout:
            raise ValueError(
                f"{spec.schema.name}: axis_names={names!r} requires a layout "
                "on the input")
        missing = [c for c in names if c not in layout]
        if missing:
            raise ValueError(
                f"{spec.schema.name}: axis name(s) {missing} not in input "
                f"layout {layout!r}")
        return tuple(layout.index(c) for c in names)
    axes = spec.GetArgument("axes", None)
    if axes is not None and len(axes):
        return tuple(a % ndim for a in axes)
    return tuple(range(ndim))


def _reduce(xp, kind, x, axes, keep, ddof=0, mean=None):
    x = x.astype(xp.float32) if kind not in ("Max", "Min") else x
    if kind == "Sum":
        return xp.sum(x, axis=axes, keepdims=keep)
    if kind == "Mean":
        return xp.mean(x, axis=axes, keepdims=keep)
    if kind == "Max":
        return xp.max(x, axis=axes, keepdims=keep)
    if kind == "Min":
        return xp.min(x, axis=axes, keepdims=keep)
    if kind == "MeanSquare":
        return xp.mean(x * x, axis=axes, keepdims=keep)
    if kind == "RootMeanSquare":
        return xp.sqrt(xp.mean(x * x, axis=axes, keepdims=keep))
    if kind in ("StdDev", "Variance"):
        if mean is None:
            m = xp.mean(x, axis=axes, keepdims=True)
        else:
            m = mean
            if getattr(m, "ndim", 0) != x.ndim:
                # a non-keep_dims mean input: re-insert the reduced axes so
                # it broadcasts against x (reference two-input StdDev form)
                shape = [1 if a in axes else x.shape[a] for a in range(x.ndim)]
                m = xp.reshape(xp.asarray(m), shape)
        n = 1
        for a in axes:
            n *= x.shape[a]
        var = xp.sum((x - m) ** 2, axis=axes, keepdims=keep) / max(n - ddof, 1)
        return xp.sqrt(var) if kind == "StdDev" else var
    raise ValueError(kind)


def _register(kind):
    @register_operator(f"reductions.{kind}", "cpu")
    class RedCPU(Operator):
        def run_batch(self, ctx, *inputs):
            # axis_names resolves against the data input's layout
            self._in_layout = inputs[0].layout if inputs else ""
            return super().run_batch(ctx, *inputs)

        def run_sample(self, ctx, idx, x, *mean_in):
            spec = self.spec
            axes = _axes_of(spec, x.ndim, getattr(self, "_in_layout", ""))
            keep = spec.GetArgument("keep_dims", False)
            ddof = spec.GetArgument("ddof", 0) if "ddof" in spec.schema.args else 0
            mean = np.asarray(mean_in[0], np.float32) if mean_in else None
            out = _reduce(np, kind, x, axes, keep, ddof, mean)
            dt = spec.GetArgument("dtype", None)
            out = np.asarray(out)
            return out.astype(to_numpy_type(dt)) if dt is not None else out

        def output_layout(self, output_idx, inputs):
            return ""

    @register_operator(f"reductions.{kind}", "gpu")
    class RedGPU(Operator):
        def host_output_shapes(self, ctx, input_shapes, input_batches):
            shapes0 = input_shapes[0] if input_shapes else None
            if shapes0 is None:
                return None
            sh = np.asarray(shapes0)
            lays = ctx.in_layouts(self)
            axes = _axes_of(self.spec, sh.shape[1], lays[0] if lays else "")
            keep = self.spec.GetArgument("keep_dims", False)
            if keep:
                out = sh.copy()
                out[:, list(axes)] = 1
                return [out]
            kept = [a for a in range(sh.shape[1]) if a not in set(axes)]
            return [sh[:, kept]]

        def lower(self, dctx, inp: DeviceBatch, *mean_in):
            import jax.numpy as jnp

            spec = self.spec
            if inp.shapes is not None:
                raise NotImplementedError(
                    f"reductions.{kind}(gpu) requires uniform batches (pad first)"
                )
            axes = tuple(a + 1 for a in _axes_of(spec, inp.data.ndim - 1, inp.layout))
            keep = spec.GetArgument("keep_dims", False)
            ddof = spec.GetArgument("ddof", 0) if "ddof" in spec.schema.args else 0
            mean = mean_in[0].data if mean_in else None
            out = _reduce(jnp, kind, inp.data, axes, keep, ddof, mean)
            dt = spec.GetArgument("dtype", None)
            if dt is not None:
                out = out.astype(to_jnp_type(dt))
            return [DeviceBatch(out, None, "")]

    RedCPU.__name__ = f"Red{kind}CPU"
    RedGPU.__name__ = f"Red{kind}GPU"


for _k in ("Sum", "Mean", "Max", "Min", "MeanSquare", "RootMeanSquare", "StdDev", "Variance"):
    _register(_k)
