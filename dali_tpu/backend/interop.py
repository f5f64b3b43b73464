"""Python / framework interop operators.

Reference: ``dali/operators/python_function/`` (PythonFunction,
DLTensorPythonFunction, TorchPythonFunction) and the JAX bridge
``plugin/jax/fn/_jax_function_impl.py:62``. On TPU the JAX bridge is
*first-class* (SURVEY §2.4): the user function is traced straight into the
single jitted device program — no stream sync, no copies.
"""

from __future__ import annotations

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from .base import Operator

# ===================================== PythonFunction ==============================================

DALI_SCHEMA("PythonFunction").DocStr(
    "Runs a user Python function on host data (reference "
    "python_function/python_function.cc). Per-sample by default; "
    "batch_processing=True passes lists of samples."
).NumInput(0, 8).OutputFn(lambda spec: spec.GetArgument("num_outputs", 1) or 1).Devices(
    "cpu"
).MakeStateful().AddOptionalArg(
    "function", ArgType.PYTHON_OBJECT, "The callable.", None
).AddOptionalArg(
    "num_outputs", ArgType.INT, "Number of outputs.", 1
).AddOptionalArg(
    "batch_processing", ArgType.BOOL, "Pass whole batches (lists) instead of samples.", False
).AddOptionalArg("output_layouts", ArgType.STRING_VEC, "Layouts of the outputs.", None)


@register_operator("PythonFunction", "cpu")
class PythonFunction(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._fn = spec._extra.get("_function", spec.GetArgument("function", None))
        if self._fn is None:
            raise ValueError("python_function requires `function`")

    def _layouts(self):
        return self.spec.GetArgument("output_layouts", None) or []

    def run_batch(self, ctx, *inputs: HostBatch):
        n_out = self.spec.GetArgument("num_outputs", 1) or 1
        layouts = self._layouts()
        if self.spec.GetArgument("batch_processing", False):
            res = self._fn(*[list(b.samples) for b in inputs])
            if not isinstance(res, tuple):
                res = (res,)
            return [
                HostBatch([np.asarray(s) for s in r], layout=layouts[j] if j < len(layouts) else "")
                for j, r in enumerate(res)
            ]
        n = len(inputs[0]) if inputs else ctx.batch_size
        results = ctx.map_samples(
            lambda i: self._fn(*(b.samples[i] for b in inputs)), n
        )
        outs = []
        for j in range(n_out):
            samples = [
                np.asarray(r[j] if isinstance(r, tuple) else r) for r in results
            ]
            outs.append(HostBatch(samples, layout=layouts[j] if j < len(layouts) else ""))
        return outs


DALI_SCHEMA("DLTensorPythonFunction").DocStr(
    "PythonFunction over DLPack capsules (reference dltensor_function.cc). On "
    "host, numpy arrays already speak DLPack — the callable receives objects "
    "exposing __dlpack__."
).NumInput(0, 8).OutputFn(lambda spec: spec.GetArgument("num_outputs", 1) or 1).Devices(
    "cpu"
).MakeStateful().AddOptionalArg(
    "function", ArgType.PYTHON_OBJECT, "The callable.", None
).AddOptionalArg("num_outputs", ArgType.INT, "Number of outputs.", 1).AddOptionalArg(
    "batch_processing", ArgType.BOOL, "Batch mode.", True
).AddOptionalArg("output_layouts", ArgType.STRING_VEC, "Output layouts.", None).AddOptionalArg(
    "synchronize_stream", ArgType.BOOL, "Compatibility no-op.", True
)


@register_operator("DLTensorPythonFunction", "cpu")
class DLTensorPythonFunction(PythonFunction):
    pass


DALI_SCHEMA("TorchPythonFunction").DocStr(
    "PythonFunction receiving/returning torch tensors (reference "
    "plugin/pytorch torch_python_function)."
).NumInput(0, 8).OutputFn(lambda spec: spec.GetArgument("num_outputs", 1) or 1).Devices(
    "cpu"
).MakeStateful().AddOptionalArg(
    "function", ArgType.PYTHON_OBJECT, "The callable.", None
).AddOptionalArg("num_outputs", ArgType.INT, "Number of outputs.", 1).AddOptionalArg(
    "batch_processing", ArgType.BOOL, "Batch mode.", False
).AddOptionalArg("output_layouts", ArgType.STRING_VEC, "Output layouts.", None)


@register_operator("TorchPythonFunction", "cpu")
class TorchPythonFunction(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._fn = spec._extra.get("_function", spec.GetArgument("function", None))

    def run_batch(self, ctx, *inputs: HostBatch):
        import torch

        n_out = self.spec.GetArgument("num_outputs", 1) or 1
        n = len(inputs[0]) if inputs else ctx.batch_size

        def one(i):
            args = [torch.from_numpy(np.ascontiguousarray(b.samples[i])) for b in inputs]
            r = self._fn(*args)
            if not isinstance(r, tuple):
                r = (r,)
            return tuple(np.asarray(t.numpy() if hasattr(t, "numpy") else t) for t in r)

        results = ctx.map_samples(one, n)
        return [HostBatch([r[j] for r in results]) for j in range(n_out)]


# ===================================== JaxFunction (first-class) =====================================

DALI_SCHEMA("_JaxFunction").DocStr(
    """Inlines a user JAX function into the device program (reference
    ``plugin/jax/fn/_jax_function_impl.py:62`` — where the reference must
    synchronize streams and exchange DLPack capsules, here the function simply
    becomes part of the single jitted program and fuses with its neighbors)."""
).NumInput(0, 8).OutputFn(lambda spec: spec.GetArgument("num_outputs", 1) or 1).Devices(
    "gpu"
).MakeInternal().AddOptionalArg(
    "function", ArgType.PYTHON_OBJECT, "jax-traceable callable.", None
).AddOptionalArg("num_outputs", ArgType.INT, "Number of outputs.", 1).AddOptionalArg(
    "output_layouts", ArgType.STRING_VEC, "Output layouts.", None
)


@register_operator("_JaxFunction", "gpu")
class JaxFunction(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._fn = spec._extra.get("_function", spec.GetArgument("function", None))
        if self._fn is None:
            raise ValueError("jax_function requires `function`")

    def lower(self, dctx, *inputs: DeviceBatch):
        layouts = self.spec.GetArgument("output_layouts", None) or []
        res = self._fn(*(b.data for b in inputs))
        if not isinstance(res, tuple):
            res = (res,)
        shapes = inputs[0].shapes if inputs else None
        outs = []
        for j, r in enumerate(res):
            sh = shapes if (shapes is not None and r.shape[:1] == inputs[0].data.shape[:1]
                            and r.shape == inputs[0].data.shape) else None
            layout = layouts[j] if j < len(layouts) else (inputs[0].layout if inputs else "")
            outs.append(DeviceBatch(r, sh, layout))
        return outs


# ===================================== NumbaFunction ================================================

DALI_SCHEMA("NumbaFunction").DocStr(
    """Runs a (numba-jitted) kernel writing into preallocated outputs
    (reference dali/operators/numba_function/numba_func.cc + plugin/numba):
    ``run_fn(out0, .., in0, ..)``; ``setup_fn(out_shapes, in_shapes)``
    computes output shapes (defaults to the first input's shape). When numba
    is importable and ``run_fn`` is a plain function it is njit-compiled on
    first use; otherwise the callable runs as-is (so kernels remain testable
    in environments without numba, matching python_function semantics)."""
).NumInput(1, 6).OutputFn(
    lambda spec: len(spec.GetArgument("out_types", [0]) or [0])
).Devices("cpu").MakeStateful().AddOptionalArg(
    "run_fn", ArgType.PYTHON_OBJECT, "The kernel.", None
).AddOptionalArg(
    "setup_fn", ArgType.PYTHON_OBJECT, "Output-shape function.", None
).AddOptionalArg(
    "out_types", ArgType.INT_VEC, "DALIDataType per output.", None
).AddOptionalArg(
    "in_types", ArgType.INT_VEC, "DALIDataType per input (validated).", None
).AddOptionalArg(
    "outs_ndim", ArgType.INT_VEC, "ndim per output.", None
).AddOptionalArg(
    "ins_ndim", ArgType.INT_VEC, "ndim per input (validated).", None
).AddOptionalArg(
    "batch_processing", ArgType.BOOL, "Process whole batches.", False
).AddOptionalArg("blocks", ArgType.INT_VEC, "CUDA grid compat (ignored).", None
).AddOptionalArg("threads_per_block", ArgType.INT_VEC, "CUDA compat (ignored).", None)


@register_operator("NumbaFunction", "cpu")
class NumbaFunction(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._run_fn = spec._extra.get("_run_fn", spec.GetArgument("run_fn", None))
        self._setup_fn = spec._extra.get("_setup_fn", spec.GetArgument("setup_fn", None))
        if self._run_fn is None:
            raise ValueError("numba_function requires `run_fn`")
        self._compiled = None

    def _kernel(self):
        if self._compiled is None:
            fn = self._run_fn
            try:
                import numba

                if not hasattr(fn, "py_func"):  # not already a numba dispatcher
                    fn = numba.njit(fn)
            except ImportError:
                pass
            self._compiled = fn
        return self._compiled

    def _validate(self, arrays):
        from ..types import DALIDataType, from_numpy_type

        in_types = self.spec.GetArgument("in_types", None)
        ins_ndim = self.spec.GetArgument("ins_ndim", None)
        for k, a in enumerate(arrays):
            if in_types is not None and k < len(in_types):
                want = DALIDataType(int(in_types[k]))
                got = from_numpy_type(a.dtype)
                if got != want:
                    raise TypeError(
                        f"numba_function input {k}: expected {want}, got {got}")
            if ins_ndim is not None and k < len(ins_ndim) and a.ndim != int(ins_ndim[k]):
                raise TypeError(
                    f"numba_function input {k}: expected ndim {ins_ndim[k]}, got {a.ndim}")

    def _apply(self, *arrays):
        from ..types import DALIDataType, to_numpy_type

        self._validate(arrays)
        out_types = self.spec.GetArgument("out_types", None) or []
        outs_ndim = self.spec.GetArgument("outs_ndim", None)
        in_shapes = [list(a.shape) for a in arrays]
        if self._setup_fn is not None:
            out_shapes = [[0] * (int(outs_ndim[i]) if outs_ndim else arrays[0].ndim)
                          for i in range(len(out_types))]
            self._setup_fn(out_shapes, in_shapes)
        else:
            out_shapes = [in_shapes[0] for _ in out_types]
        outs = [np.zeros(shape, to_numpy_type(DALIDataType(int(dt))))
                for shape, dt in zip(out_shapes, out_types)]
        self._kernel()(*outs, *arrays)
        return tuple(outs)

    def _apply_batch(self, batches):
        """batch_processing=True: run_fn receives LISTS of samples (the
        reference numba batch contract; setup_fn sees [out][sample][dim])."""
        from ..types import DALIDataType, to_numpy_type

        n = len(batches[0])
        for arrays in zip(*batches):
            self._validate(arrays)
        out_types = self.spec.GetArgument("out_types", None) or []
        outs_ndim = self.spec.GetArgument("outs_ndim", None)
        in_shapes = [[list(a.shape) for a in b] for b in batches]
        if self._setup_fn is not None:
            out_shapes = [[[0] * (int(outs_ndim[j]) if outs_ndim else batches[0][i].ndim)
                           for i in range(n)] for j in range(len(out_types))]
            self._setup_fn(out_shapes, in_shapes)
        else:
            out_shapes = [in_shapes[0] for _ in out_types]
        outs = [[np.zeros(shape, to_numpy_type(DALIDataType(int(dt))))
                 for shape in shapes]
                for shapes, dt in zip(out_shapes, out_types)]
        self._kernel()(*outs, *[list(b) for b in batches])
        return outs

    def run_batch(self, ctx, *inputs: HostBatch):
        n_out = len(self.spec.GetArgument("out_types", [0]) or [0])
        if self.spec.GetArgument("batch_processing", False):
            outs = self._apply_batch([list(b.samples) for b in inputs])
            return [HostBatch(o, layout="") for o in outs]
        n = len(inputs[0])
        results = ctx.map_samples(
            lambda i: self._apply(*(b.samples[i] for b in inputs)), n)
        return [HostBatch([r[j] for r in results], layout="")
                for j in range(n_out)]
