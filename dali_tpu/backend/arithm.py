"""Arithmetic expression operator.

Reference: ``dali/operators/math/expressions/`` (~9k LoC of CUDA expression-tree
evaluation) + the Python operator overloads in ``data_node.py``/``math.py``. On TPU
the heavy machinery disappears: each expression node is evaluated with numpy (host)
or jnp (device) and XLA fuses chains of them inside the single device program — the
fusion DALI implements by hand falls out of the compiler.

Expression descriptors use a DALI-like mini-DSL: ``add(&0 $2:9)`` where ``&i`` is
input i and ``$v:t`` a literal with DALIDataType t (reference
``expression_tree.h``; we keep single-op expressions since XLA re-fuses).
"""

from __future__ import annotations

import re

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..types import DALIDataType, to_numpy_type
from .base import Operator

DALI_SCHEMA("_ArithmeticGenericOp").DocStr(
    "Elementwise arithmetic over batches (reference _ArithmeticGenericOp schema)."
).NumInput(0, 16).NumOutput(1).Devices("cpu", "gpu").MakeInternal().AddArg(
    "expression_desc", ArgType.STRING, "Expression descriptor, e.g. 'add(&0 $1:9)'."
)

_TOKEN_RE = re.compile(r"&(\d+)|\$(.+?):(\d+)")


def _parse(desc: str):
    op, _, rest = desc.partition("(")
    rest = rest.rstrip(")")
    tokens = []
    for tok in rest.split():
        m = _TOKEN_RE.fullmatch(tok)
        if not m:
            raise ValueError(f"Bad expression token {tok!r} in {desc!r}")
        if m.group(1) is not None:
            tokens.append(("input", int(m.group(1))))
        else:
            dtype = DALIDataType(int(m.group(3)))
            val = eval(m.group(2), {"__builtins__": {}})  # literal repr only
            tokens.append(("const", np.asarray(val, dtype=to_numpy_type(dtype))))
    return op, tokens


def _ops_table(xp):
    return {
        "add": lambda a, b: a + b,
        "sub": lambda a, b: a - b,
        "mul": lambda a, b: a * b,
        "fdiv": lambda a, b: _true_div(xp, a, b),
        "div": lambda a, b: a // b if _is_int(a) and _is_int(b) else a / b,
        "mod": lambda a, b: a % b,
        "pow": lambda a, b: a**b,
        "fpow": lambda a, b: _as_float(xp, a) ** _as_float(xp, b),
        "minus": lambda a: -a,
        "plus": lambda a: +a,
        "abs": lambda a: abs(a),
        "sqrt": lambda a: xp.sqrt(_as_float(xp, a)),
        "rsqrt": lambda a: 1.0 / xp.sqrt(_as_float(xp, a)),
        "cbrt": lambda a: xp.cbrt(_as_float(xp, a)),
        "exp": lambda a: xp.exp(_as_float(xp, a)),
        "log": lambda a: xp.log(_as_float(xp, a)),
        "log2": lambda a: xp.log2(_as_float(xp, a)),
        "log10": lambda a: xp.log10(_as_float(xp, a)),
        "sin": lambda a: xp.sin(_as_float(xp, a)),
        "cos": lambda a: xp.cos(_as_float(xp, a)),
        "tan": lambda a: xp.tan(_as_float(xp, a)),
        "asin": lambda a: xp.arcsin(_as_float(xp, a)),
        "acos": lambda a: xp.arccos(_as_float(xp, a)),
        "atan": lambda a: xp.arctan(_as_float(xp, a)),
        "sinh": lambda a: xp.sinh(_as_float(xp, a)),
        "cosh": lambda a: xp.cosh(_as_float(xp, a)),
        "tanh": lambda a: xp.tanh(_as_float(xp, a)),
        "asinh": lambda a: xp.arcsinh(_as_float(xp, a)),
        "acosh": lambda a: xp.arccosh(_as_float(xp, a)),
        "atanh": lambda a: xp.arctanh(_as_float(xp, a)),
        "ceil": lambda a: xp.ceil(_as_float(xp, a)),
        "floor": lambda a: xp.floor(_as_float(xp, a)),
        "atan2": lambda a, b: xp.arctan2(a, b),
        "min": lambda a, b: xp.minimum(a, b),
        "max": lambda a, b: xp.maximum(a, b),
        "clamp": lambda a, lo, hi: xp.clip(a, lo, hi),
        "eq": lambda a, b: a == b,
        "neq": lambda a, b: a != b,
        "lt": lambda a, b: a < b,
        "leq": lambda a, b: a <= b,
        "gt": lambda a, b: a > b,
        "geq": lambda a, b: a >= b,
        "bitand": lambda a, b: a & b,
        "bitor": lambda a, b: a | b,
        "bitxor": lambda a, b: a ^ b,
    }


def _is_int(a):
    return np.issubdtype(np.asarray(a).dtype if isinstance(a, np.ndarray) else a.dtype, np.integer)


def _as_float(xp, a):
    dt = a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype
    if np.issubdtype(dt, np.floating):
        return a
    return a.astype(xp.float32)


def _true_div(xp, a, b):
    return _as_float(xp, a) / _as_float(xp, b)


@register_operator("_ArithmeticGenericOp", "cpu")
class ArithmCPU(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._op, self._tokens = _parse(spec.GetArgument("expression_desc"))

    def run_sample(self, ctx, idx, *inputs):
        args = [inputs[t[1]] if t[0] == "input" else t[1] for t in self._tokens]
        return np.asarray(_ops_table(np)[self._op](*args))

    def output_layout(self, output_idx, inputs):
        for b in inputs:
            if b.layout:
                return b.layout
        return ""


@register_operator("_ArithmeticGenericOp", "gpu")
class ArithmGPU(Operator):
    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._op, self._tokens = _parse(spec.GetArgument("expression_desc"))

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        # broadcast shape inference: the output's per-sample extents are the
        # elementwise max over the inputs' (right-aligned, numpy broadcasting);
        # requires every tensor input's shape to be host-known — an unknown
        # input could dominate the broadcast
        known = [s for s in input_shapes if s is not None]
        if not known or len(known) != len(input_shapes):
            return None
        known = [np.asarray(s) for s in known]
        nd = max(s.shape[1] for s in known)
        n = known[0].shape[0]
        out = np.ones((n, nd), np.int64)
        for s in known:
            pad = nd - s.shape[1]
            aligned = np.concatenate(
                [np.ones((n, pad), np.int64), s.astype(np.int64)], axis=1)
            # numpy/reference broadcasting: each dim must match or be 1 —
            # the cpu path raises per sample; without this check the device
            # path silently emitted canvas-max garbage extents
            bad = (aligned != out) & (aligned != 1) & (out != 1)
            if bad.any():
                i = int(np.argmax(bad.any(axis=1)))
                raise ValueError(
                    f"{self.spec.schema.name}: per-sample shapes are not "
                    f"broadcastable (sample {i}: "
                    f"{tuple(int(v) for v in out[i])} vs "
                    f"{tuple(int(v) for v in aligned[i])})")
            out = np.maximum(out, aligned)
        return [out]

    def lower(self, dctx, *inputs: DeviceBatch):
        import jax.numpy as jnp

        args = []
        shapes = None
        layout = ""
        max_ndim = max((inputs[t[1]].data.ndim for t in self._tokens if t[0] == "input"), default=1)
        for t in self._tokens:
            if t[0] == "input":
                db = inputs[t[1]]
                data = db.data
                if data.ndim < max_ndim:
                    # per-sample broadcasting: batch dim first, sample dims
                    # right-aligned (reference expression broadcasting semantics)
                    n = data.shape[0]
                    pad = max_ndim - data.ndim
                    data = data.reshape(n, *([1] * pad), *data.shape[1:])
                args.append(data)
                if shapes is None and db.shapes is not None and db.data.ndim == max_ndim:
                    shapes = db.shapes
                layout = layout or db.layout
            else:
                args.append(jnp.asarray(t[1]))
        out = _ops_table(jnp)[self._op](*args)
        return [DeviceBatch(out, shapes, layout)]
