"""Symbolic graph edge — DALI's ``DataNode`` (reference
``dali/python/nvidia/dali/data_node.py``).

A DataNode is produced by calling an ``fn.*`` operator inside a ``@pipeline_def``
function. Arithmetic operators on DataNodes capture expressions as
``_ArithmeticGenericOp`` nodes (reference ``dali/operators/math/expressions/`` and
``dali/python/nvidia/dali/math.py``) — on TPU the expression bodies fuse for free
inside the single jitted device program, so each overload simply emits one node.
"""

from __future__ import annotations

from typing import Optional

from . import types as _types

_CPU_LIKE = ("cpu",)


class DataNode:
    def __init__(self, name: str, device: str = "cpu", source=None, source_idx: int = 0):
        self.name = name
        self.device = device  # "cpu" or "gpu" (gpu == TPU device side)
        self.source = source  # the producing graph node (graph.OpNode) or None
        self.source_idx = source_idx

    # -- device movement ------------------------------------------------------
    def gpu(self) -> "DataNode":
        """Transfer to the device side. Inserts an explicit copy node
        (reference: ``data_node.py`` ``DataNode.gpu`` inserting MakeContiguous)."""
        if self.device == "gpu":
            return self
        from . import _op_call

        return _op_call("_CopyToDevice", device="mixed", inputs=[self])

    def cpu(self) -> "DataNode":
        if self.device == "cpu":
            return self
        raise ValueError(
            "device->host transfers inside the graph are not supported (match DALI: "
            "no gpu->cpu edges, reference data_node.py)."
        )

    # -- introspection ---------------------------------------------------------
    def shape(self, dtype=None, device="cpu"):
        """Per-sample shapes as a new DataNode (reference fn.shapes)."""
        from . import _op_call

        return _op_call("Shapes", device=self.device, inputs=[self], dtype=dtype or _types.INT64)

    @property
    def property(self):  # pragma: no cover - parity stub
        raise NotImplementedError("Use fn.get_property")

    # -- arithmetic -------------------------------------------------------------
    def _arithm(self, op: str, *others, reverse=False):
        from . import _op_call

        operands = []
        for o in (others[::-1] + (self,)) if reverse else ((self,) + others):
            operands.append(o)
        # Build expression string like DALI's "add(&0 &1)" little DSL
        # (reference math/expressions/expression_tree.h); we keep a flat single-op
        # expression — XLA fuses chains at compile time.
        inputs = []
        descs = []
        for o in operands:
            if isinstance(o, DataNode):
                descs.append(f"&{len(inputs)}")
                inputs.append(o)
            elif isinstance(o, _types.ScalarConstant):
                descs.append(_scalar_desc(o.value, o.dtype))
            elif isinstance(o, (bool, int, float)):
                descs.append(_scalar_desc(o, None))
            else:
                return NotImplemented
        device = "gpu" if any(i.device == "gpu" for i in inputs) else "cpu"
        if device == "gpu":
            # DALI permits CPU per-sample scalar operands in GPU expressions
            # (reference math/expressions): transfer them implicitly.
            inputs = [i if i.device == "gpu" else i.gpu() for i in inputs]
        expr = f"{op}({' '.join(descs)})"
        return _op_call("_ArithmeticGenericOp", device=device, inputs=inputs, expression_desc=expr)

    def __add__(self, other):
        return self._arithm("add", other)

    def __radd__(self, other):
        return self._arithm("add", other, reverse=True)

    def __sub__(self, other):
        return self._arithm("sub", other)

    def __rsub__(self, other):
        return self._arithm("sub", other, reverse=True)

    def __mul__(self, other):
        return self._arithm("mul", other)

    def __rmul__(self, other):
        return self._arithm("mul", other, reverse=True)

    def __truediv__(self, other):
        return self._arithm("fdiv", other)

    def __rtruediv__(self, other):
        return self._arithm("fdiv", other, reverse=True)

    def __floordiv__(self, other):
        return self._arithm("div", other)

    def __rfloordiv__(self, other):
        return self._arithm("div", other, reverse=True)

    def __mod__(self, other):
        return self._arithm("mod", other)

    def __rmod__(self, other):
        return self._arithm("mod", other, reverse=True)

    def __pow__(self, other):
        return self._arithm("pow", other)

    def __rpow__(self, other):
        return self._arithm("pow", other, reverse=True)

    def __neg__(self):
        return self._arithm("minus")

    def __pos__(self):
        return self._arithm("plus")

    def __abs__(self):
        return self._arithm("abs")

    def __eq__(self, other):  # noqa: D105
        return self._arithm("eq", other)

    def __ne__(self, other):
        return self._arithm("neq", other)

    def __lt__(self, other):
        return self._arithm("lt", other)

    def __le__(self, other):
        return self._arithm("leq", other)

    def __gt__(self, other):
        return self._arithm("gt", other)

    def __ge__(self, other):
        return self._arithm("geq", other)

    def __and__(self, other):
        return self._arithm("bitand", other)

    def __rand__(self, other):
        return self._arithm("bitand", other, reverse=True)

    def __or__(self, other):
        return self._arithm("bitor", other)

    def __ror__(self, other):
        return self._arithm("bitor", other, reverse=True)

    def __xor__(self, other):
        return self._arithm("bitxor", other)

    def __rxor__(self, other):
        return self._arithm("bitxor", other, reverse=True)

    def __bool__(self):
        raise TypeError(
            "A DataNode cannot be used in a plain Python `if`/`and`/`or`. Use "
            "`@pipeline_def(enable_conditionals=True)` for per-sample conditionals "
            "(reference _conditionals.py)."
        )

    __hash__ = object.__hash__

    # -- indexing ---------------------------------------------------------------
    def __getitem__(self, idx):
        """Per-sample subscript → `_TensorSubscript` op (reference
        ``dali/operators/generic/subscript.cc``, data_node.py __getitem__)."""
        from . import _op_call

        if not isinstance(idx, tuple):
            idx = (idx,)
        kwargs = {}
        n_dim = 0
        inputs = [self]
        for d, i in enumerate(idx):
            if i is Ellipsis:
                raise NotImplementedError("Ellipsis subscript not supported yet")
            if isinstance(i, slice):
                if i.step not in (None, 1):
                    raise NotImplementedError("Strided subscript not supported yet")
                if i.start is not None:
                    kwargs[f"lo_{d}"] = _sub_arg(i.start, inputs, kwargs, f"lo_{d}")
                if i.stop is not None:
                    kwargs[f"hi_{d}"] = _sub_arg(i.stop, inputs, kwargs, f"hi_{d}")
            elif i is None:
                raise NotImplementedError("newaxis subscript not supported yet")
            else:
                kwargs[f"at_{d}"] = _sub_arg(i, inputs, kwargs, f"at_{d}")
            n_dim += 1
        kwargs["num_subscripts"] = n_dim
        return _op_call("_TensorSubscript", device=self.device, inputs=inputs, **kwargs)

    def __repr__(self):
        src = self.source.instance_name if self.source is not None else None
        return f"DataNode(name={self.name!r}, device={self.device!r}, source={src!r})"


def _sub_arg(v, inputs, kwargs, name):
    if isinstance(v, DataNode):
        return v
    return int(v)


def _scalar_desc(value, dtype: Optional[_types.DALIDataType]):
    if dtype is None:
        if isinstance(value, bool):
            dtype = _types.BOOL
        elif isinstance(value, int):
            dtype = _types.INT32
        else:
            dtype = _types.FLOAT
    return f"${repr(value)}:{int(dtype)}"


def _check(maybe_node):
    if not isinstance(maybe_node, DataNode):
        raise TypeError(f"Expected DataNode, got {type(maybe_node)}")
    return maybe_node
