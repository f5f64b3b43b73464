"""Callback pickling for spawn-based parallel workers.

Reference: ``dali/python/nvidia/dali/pickling.py`` — DALI ships a
``pickle_by_value`` decorator and a pluggable ``py_callback_pickler`` so that
``parallel=True`` external-source callbacks survive ``spawn`` (where plain
pickle serializes functions *by reference* and the child can't import
``__main__`` closures, lambdas, or interactively-defined functions).

Same surface here: mark a callback with :func:`pickle_by_value` (or pass
``py_callback_pickler=dali_tpu.pickling`` to the pipeline) and the function is
serialized by value — code object via ``marshal``, plus defaults, closure
cells, and the referenced globals."""

from __future__ import annotations

import io
import marshal
import pickle
import types

_BY_VALUE_ATTR = "_dali_tpu_pickle_by_value"


def pickle_by_value(fn):
    """Mark ``fn`` to be pickled by value (reference pickling.py
    ``pickle_by_value``). Works on lambdas, closures, and ``__main__``
    functions that plain pickle rejects under spawn."""
    setattr(fn, _BY_VALUE_ATTR, True)
    return fn


def _function_globals(fn):
    """The subset of the function's globals it actually references (and that
    pickles). Modules are re-imported by name on the other side."""
    out, modules = {}, {}
    names = set(fn.__code__.co_names)
    for const in fn.__code__.co_consts:  # nested lambdas/comprehensions
        if isinstance(const, types.CodeType):
            names.update(const.co_names)
    for k in names:
        if k not in fn.__globals__:
            continue
        v = fn.__globals__[k]
        if isinstance(v, types.ModuleType):
            modules[k] = v.__name__
            continue
        try:
            pickle.dumps(v)
            out[k] = v
        except Exception:
            pass
    return out, modules


class _ModuleRef:
    """Closure cells can hold modules (e.g. a function-local ``import numpy``
    in an enclosing scope); encode them by name."""

    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name


def _encode_cell(v):
    return _ModuleRef(v.__name__) if isinstance(v, types.ModuleType) else v


def _reduce_function(fn):
    closure = tuple(_encode_cell(c.cell_contents) for c in (fn.__closure__ or ()))
    gl, modules = _function_globals(fn)
    return _rebuild_function, (
        marshal.dumps(fn.__code__),
        fn.__name__,
        fn.__defaults__,
        closure,
        gl,
        modules,
        fn.__kwdefaults__,
    )


def _rebuild_function(code_blob, name, defaults, closure, gl, modules, kwdefaults=None):
    import builtins
    import importlib

    g = {"__builtins__": builtins}
    g.update(gl)
    for alias, modname in modules.items():
        g[alias] = importlib.import_module(modname)
    def _decode(v):
        return importlib.import_module(v.name) if isinstance(v, _ModuleRef) else v

    cells = tuple(types.CellType(_decode(v)) for v in closure)
    code = marshal.loads(code_blob)
    f = types.FunctionType(code, g, name, defaults, cells or None)
    if kwdefaults:
        f.__kwdefaults__ = dict(kwdefaults)
    return f


class _Pickler(pickle.Pickler):
    def __init__(self, file, *, by_value_all=False, **kw):
        super().__init__(file, **kw)
        self._by_value_all = by_value_all

    def reducer_override(self, obj):
        if (
            isinstance(obj, types.FunctionType)
            # never by-value our own rebuild machinery (it IS the reduce
            # target — reducing it again would recurse forever)
            and getattr(obj, "__module__", None) != __name__
            and (
                self._by_value_all
                or getattr(obj, _BY_VALUE_ATTR, False)
                or obj.__name__ == "<lambda>"
                or obj.__module__ == "__main__"
                or "<locals>" in getattr(obj, "__qualname__", "")
            )
        ):
            return _reduce_function(obj)
        return NotImplemented


def dumps(obj, *, by_value_all=False) -> bytes:
    buf = io.BytesIO()
    _Pickler(buf, by_value_all=by_value_all, protocol=pickle.HIGHEST_PROTOCOL).dump(obj)
    return buf.getvalue()


def loads(blob: bytes):
    return pickle.loads(blob)
