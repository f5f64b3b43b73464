"""Math DSL over DataNodes (reference ``dali/python/nvidia/dali/math.py:21-283``).

Each function captures an ``_ArithmeticGenericOp`` node; the expression compiles
into the fused device program (or evaluates with numpy on host)."""

from __future__ import annotations

from .data_node import DataNode


def _arithm(op, *args):
    if isinstance(args[0], DataNode):
        return args[0]._arithm(op, *args[1:])
    if len(args) == 2 and isinstance(args[1], DataNode):
        return args[1]._arithm(op, args[0], reverse=True)
    # eager path: dynamic-mode Batch operands (reference ndd math support)
    from .experimental.dynamic import Batch, _batch_arithm

    if any(isinstance(a, Batch) for a in args):
        out = _batch_arithm(op, *args)
        if out is NotImplemented:
            raise TypeError(
                f"math.{op}: unsupported operand types "
                f"{tuple(type(a).__name__ for a in args)}")
        return out
    raise TypeError(f"math.{op} requires a DataNode or dynamic Batch argument")


def sqrt(x):
    return _arithm("sqrt", x)


def rsqrt(x):
    return _arithm("rsqrt", x)


def cbrt(x):
    return _arithm("cbrt", x)


def exp(x):
    return _arithm("exp", x)


def log(x):
    return _arithm("log", x)


def log2(x):
    return _arithm("log2", x)


def log10(x):
    return _arithm("log10", x)


def abs(x):  # noqa: A001
    return _arithm("abs", x)


def fabs(x):
    return _arithm("abs", x)


def floor(x):
    return _arithm("floor", x)


def ceil(x):
    return _arithm("ceil", x)


def sin(x):
    return _arithm("sin", x)


def cos(x):
    return _arithm("cos", x)


def tan(x):
    return _arithm("tan", x)


def asin(x):
    return _arithm("asin", x)


def acos(x):
    return _arithm("acos", x)


def atan(x):
    return _arithm("atan", x)


def atan2(x, y):
    return _arithm("atan2", x, y)


def sinh(x):
    return _arithm("sinh", x)


def cosh(x):
    return _arithm("cosh", x)


def tanh(x):
    return _arithm("tanh", x)


def asinh(x):
    return _arithm("asinh", x)


def acosh(x):
    return _arithm("acosh", x)


def atanh(x):
    return _arithm("atanh", x)


def pow(x, y):  # noqa: A001
    return _arithm("pow", x, y)


def fpow(x, y):
    return _arithm("fpow", x, y)


def min(x, y):  # noqa: A001
    return _arithm("min", x, y)


def max(x, y):  # noqa: A001
    return _arithm("max", x, y)


def clamp(x, lo, hi):
    return _arithm("clamp", x, lo, hi)
